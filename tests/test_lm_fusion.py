"""RNN-LM + shallow-fusion tests.

Covers the LM module (scan forward vs stepwise decode), the
``make_lm_step_fn`` adapter contract (scalar tokens for the host beam,
batched tokens + explicit state for the on-device beam), and fusion
semantics in both beam searchers on controllable synthetic models
(reference: decoders/transducer.py:311-314,386-409).

The synthetic acoustic model bounds emissions through the prediction
network state (after ``max_emits`` the non-blank outputs drop by a large
penalty) so beam outcomes are exact, not length-normalization artifacts.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.decoding.beam_batched import beam_search_batched
from tsasr_tpu.models.lm import RNNLM, RNNLMConfig, make_lm_step_fn


def _tiny_lm(vocab=5, seed=0):
    cfg = RNNLMConfig(vocab_size=vocab, embedding_dim=8, hidden_size=12,
                      num_layers=1, dnn_neurons=8, dropout=0.0)
    model = RNNLM(cfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((2, 3), jnp.int32))
    return model, variables


class TestRNNLM:
    def test_step_matches_scan_forward(self):
        model, variables = _tiny_lm()
        tokens = jnp.asarray([[0, 2, 1, 3], [4, 1, 0, 2]], jnp.int32)
        logits = model.apply(variables, tokens)
        ref = jax.nn.log_softmax(logits, axis=-1)

        state = model.apply(variables, 2, method=model.initial_state)
        for u in range(tokens.shape[1]):
            lp, state = model.apply(variables, tokens[:, u], state,
                                    method=model.step)
            np.testing.assert_allclose(np.asarray(lp),
                                       np.asarray(ref[:, u]), atol=1e-5)

    def test_adapter_scalar_and_batch(self):
        model, variables = _tiny_lm()
        step = make_lm_step_fn(model, variables)
        # scalar token + None state (host beam contract)
        lp, state = step(2, None)
        assert lp.shape == (5,)
        lp2, _ = step(1, state)
        assert lp2.shape == (5,)
        # batch tokens + explicit state (batched beam contract)
        state_b = model.apply(variables, 3, method=model.initial_state)
        lp_b, state_b2 = step(jnp.asarray([0, 1, 2]), state_b)
        assert lp_b.shape == (3, 5)
        # batch row == scalar run with same history
        lp_scalar, _ = step(2, None)
        np.testing.assert_allclose(np.asarray(lp_b[2]),
                                   np.asarray(lp_scalar), atol=1e-6)


def _bounded_model(V, max_emits=1, penalty=-50.0):
    """Acoustic model whose PN state counts emissions: after
    ``max_emits`` every non-blank output is penalized into oblivion.
    State leaves are (N, 1) floats (stream axis at -2, like the LSTM)."""

    def predict_step(tokens, state):
        if state is None:
            state = jnp.zeros((tokens.shape[0], 1))
        pen = jnp.where(state >= max_emits, penalty, 0.0)   # (N, 1)
        dec = jnp.concatenate(
            [jnp.zeros_like(pen),
             jnp.broadcast_to(pen, (pen.shape[0], V - 1))], axis=-1)
        return dec, state + 1.0

    def joint_step(enc_t, dec):
        return enc_t + dec

    return predict_step, joint_step


def _constant_lm(log_probs):
    """LM ignoring history: always the given (V,) log-prob row. State is
    an (N, 1) dummy so the beam's gather machinery exercises it."""
    row = jnp.asarray(log_probs)

    def step(tokens, state):
        if state is None:
            state = jnp.zeros((tokens.shape[0], 1))
        return (jnp.broadcast_to(row, (tokens.shape[0], row.shape[0])),
                state)

    return step


ACOUSTIC_2FRAME = np.asarray([
    # frame 0: token 1 edges out token 2; frame 1: blank dominates
    [np.log(0.10), np.log(0.46), np.log(0.44)],
    [np.log(0.98), np.log(0.011), np.log(0.009)],
], np.float32)


class TestBatchedBeamFusion:
    V = 3  # blank, a, b

    def _decode(self, lm_step=None, lm_weight=0.0, max_emits=1,
                table=None):
        table = ACOUSTIC_2FRAME if table is None else table
        predict, joint = _bounded_model(self.V, max_emits=max_emits)
        enc = jnp.asarray(table)[None]
        B, K = 1, 2
        tokens, lengths, scores = beam_search_batched(
            predict, joint, jnp.zeros((B * K, 1)), enc, blank=0,
            beam_size=K, max_symbols=8, max_expansions=2,
            expand_beam=10.0, lm_step_fn=lm_step, lm_weight=lm_weight,
            lm_initial_state=None if lm_step is None
            else jnp.zeros((B * K, 1)))
        return [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])]

    def test_no_lm_picks_acoustic_argmax(self):
        assert self._decode() == [1]

    def test_neutral_lm_is_noop(self):
        uniform = np.log(np.full(self.V, 1 / self.V, np.float32))
        assert self._decode(_constant_lm(uniform), 0.5) == [1]

    def test_biased_lm_flips_decision(self):
        biased = np.log(np.asarray([0.05, 0.05, 0.9], np.float32))
        assert self._decode(_constant_lm(biased), 2.0) == [2]

    def test_lm_state_advances_on_emission(self):
        """An LM that prefers token 1 first, then token 2 (state =
        emission count) must shape the 2-token output [1, 2]."""
        table = np.broadcast_to(ACOUSTIC_2FRAME[0], (2, self.V)).copy()

        def lm_step(tokens, state):
            if state is None:
                state = jnp.zeros((tokens.shape[0], 1))
            first = np.log(np.asarray([0.1, 0.8, 0.1], np.float32))
            later = np.log(np.asarray([0.1, 0.1, 0.8], np.float32))
            row = jnp.where(state > 0, later[None], first[None])
            return row, state + 1.0

        best = self._decode(lm_step, lm_weight=3.0, max_emits=2,
                            table=table)
        assert best == [1, 2]


class TestHostBeamFusion:
    """Deterministic host-beam fusion: override the searcher's jitted
    device calls with the same bounded synthetic model."""

    V = 3

    def _make_searcher(self, lm_step_fn=None, lm_weight=0.0):
        from tsasr_tpu.decoding.beam import TransducerBeamSearcher
        predict, joint = _bounded_model(self.V)
        searcher = TransducerBeamSearcher.__new__(TransducerBeamSearcher)
        searcher.model = searcher.params = None
        searcher.blank = 0
        searcher.beam_size = 2
        searcher.nbest = 1
        searcher.lm_step_fn = lm_step_fn
        searcher.lm_weight = lm_weight
        searcher.state_beam = 2.3
        searcher.expand_beam = 10.0
        searcher._greedy = None
        searcher._predict_step = \
            lambda params, token, state: predict(token, state)
        searcher._joint_log_probs = \
            lambda params, enc_t, dec: joint(enc_t[None], dec)
        searcher._initial_state = lambda: jnp.zeros((1, 1))
        return searcher

    def test_no_lm_acoustic_winner(self):
        searcher = self._make_searcher()
        hyps, _, _, _ = searcher(ACOUSTIC_2FRAME[None])
        assert hyps[0] == [1]

    def test_biased_lm_flips_host_beam(self):
        def biased_lm(token, state):
            row = np.log(np.asarray([0.05, 0.05, 0.9], np.float32))
            return jnp.asarray(row), state

        fused = self._make_searcher(biased_lm, lm_weight=2.0)
        hyps, _, _, _ = fused(ACOUSTIC_2FRAME[None])
        assert hyps[0] == [2]


class TestRealLMInBatchedBeam:
    def test_rnnlm_states_ride_the_beam(self):
        """The actual RNNLM (LSTM state leaves (L, N, H)) must survive
        the batched beam's per-hypothesis gathers and emission-masked
        state advances."""
        model, variables = _tiny_lm(vocab=3)
        from tsasr_tpu.models.lm import lm_initial_state

        lm_step = make_lm_step_fn(model, variables)
        predict, joint = _bounded_model(3, max_emits=2)
        enc = jnp.asarray(np.broadcast_to(ACOUSTIC_2FRAME[0], (3, 3))
                          .astype(np.float32))[None]
        B, K = 1, 2
        tokens, lengths, scores = beam_search_batched(
            predict, joint, jnp.zeros((B * K, 1)), enc, blank=0,
            beam_size=K, max_symbols=6, max_expansions=2,
            expand_beam=10.0, lm_step_fn=lm_step, lm_weight=0.7,
            lm_initial_state=lm_initial_state(model, variables, B * K))
        assert tokens.shape == (1, 2, 6)
        best = [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])]
        assert all(t in (1, 2) for t in best)
        assert np.isfinite(np.asarray(scores)).all()
