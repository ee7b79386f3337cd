"""Decoding tests against synthetic controllable models.

Validates the on-device greedy scan and both beam searchers on
hand-crafted joint functions where the optimal hypothesis is known —
including the classic case where greedy is suboptimal and beam search
must recover the better path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.decoding.beam_batched import beam_search_batched
from tsasr_tpu.decoding.greedy import greedy_decode


def make_stateless_model(log_prob_table):
    """A 'model' whose joint output depends only on the frame, not the
    prediction-network state. log_prob_table: (T, V) per-frame log-probs;
    enc_t passes the frame's row through."""

    def predict_step(tokens, state):
        return jnp.zeros((tokens.shape[0], 4)), state

    def joint_step(enc_t, dec):
        return enc_t  # enc carries the per-frame log-probs directly

    return predict_step, joint_step


class TestGreedy:
    def test_emits_argmax_per_frame(self):
        # frame log-probs: argmax sequence = [1, blank, 2]
        table = np.log(np.asarray([
            [0.1, 0.8, 0.1],
            [0.8, 0.1, 0.1],
            [0.1, 0.1, 0.8],
        ], np.float32))
        predict, joint = make_stateless_model(table)
        enc = jnp.asarray(table)[None]          # (1, 3, V)
        tokens, counts, scores = greedy_decode(
            predict, joint, None, enc, blank=0)
        emitted = [int(t) for t in np.asarray(tokens[0]) if t != 0]
        assert emitted == [1, 2]
        assert int(counts[0]) == 2

    def test_respects_lengths(self):
        table = np.log(np.full((4, 3), 1 / 3, np.float32))
        table[:, 1] += 1.0  # always emits token 1
        predict, joint = make_stateless_model(table)
        enc = jnp.asarray(table)[None]
        tokens, counts, _ = greedy_decode(
            predict, joint, None, enc,
            rel_lengths=jnp.asarray([0.5]), blank=0)
        assert int(counts[0]) == 2  # only 2 valid frames


def make_counting_model(target, emit_frames, v=5, peak=0.0, off=-8.0):
    """State-dependent synthetic model: the prediction state counts
    emissions; the joint peaks at ``target[count]`` only when the frame
    equals ``emit_frames[count]``, otherwise at blank. State leaves are
    shaped (1, N, 1) to match the searchers' (..., N, H) convention."""
    target = jnp.asarray(target, jnp.int32)
    emit_frames = jnp.asarray(emit_frames, jnp.float32)

    def predict_step(tokens, state):
        count = state[0, :, 0] + (tokens != 0).astype(jnp.float32)
        return count[:, None], count[None, :, None]

    def joint_step(enc_t, dec):
        frame = enc_t[:, 0]
        count = jnp.clip(dec[:, 0].astype(jnp.int32), 0,
                         len(target) - 1)
        done = dec[:, 0] >= len(target)
        expected_frame = emit_frames[count]
        should_emit = (frame == expected_frame) & ~done
        logp = jnp.full((frame.shape[0], v), off)
        logp = logp.at[:, 0].set(jnp.where(should_emit, off, peak))
        tok = target[count]
        idx = jnp.arange(frame.shape[0])
        logp = logp.at[idx, tok].set(
            jnp.where(should_emit, peak, off))
        return logp

    def initial_state(n):
        return jnp.zeros((1, n, 1))

    return predict_step, joint_step, initial_state


class TestBatchedBeam:
    def test_matches_greedy_on_peaked_model(self):
        target, frames = [2, 3, 1], [0, 2, 4]
        predict, joint, init = make_counting_model(target, frames)
        enc = jnp.arange(5, dtype=jnp.float32)[None, :, None]
        g_tokens, g_counts, _ = greedy_decode(predict, joint, init(1),
                                              enc, blank=0)
        greedy_hyp = [int(t) for t in np.asarray(g_tokens[0]) if t != 0]
        assert greedy_hyp == target

        tokens, lengths, scores = beam_search_batched(
            predict, joint, init(3), enc, blank=0, beam_size=3,
            max_symbols=8)
        best = tokens[0, 0, : int(lengths[0, 0])].tolist()
        assert best == target

    def test_beam_recovers_delayed_evidence(self):
        """Greedy trap: frame 0 slightly prefers token 1, but emitting
        poisons frame 1 where the clean path scores much better."""

        def predict_step(tokens, state):
            count = state[0, :, 0] + (tokens != 0).astype(jnp.float32)
            return count[:, None], count[None, :, None]

        def joint_step(enc_t, dec):
            frame = enc_t[:, 0]
            emitted = dec[:, 0] > 0
            f0 = jnp.stack([jnp.full_like(frame, -0.8),   # blank
                            jnp.full_like(frame, -0.6),   # token 1
                            jnp.full_like(frame, -3.0)], axis=1)
            f1_clean = jnp.stack([jnp.full_like(frame, -3.0),
                                  jnp.full_like(frame, -3.0),
                                  jnp.full_like(frame, -0.05)], axis=1)
            f1_emitted = jnp.stack([jnp.full_like(frame, -2.0),
                                    jnp.full_like(frame, -4.0),
                                    jnp.full_like(frame, -4.0)],
                                   axis=1)
            f1 = jnp.where(emitted[:, None], f1_emitted, f1_clean)
            return jnp.where((frame < 0.5)[:, None], f0, f1)

        enc = jnp.asarray([[[0.0], [1.0]]])

        g_tokens, _, _ = greedy_decode(
            predict_step, joint_step, jnp.zeros((1, 1, 1)), enc,
            blank=0)
        greedy_hyp = [int(t) for t in np.asarray(g_tokens[0]) if t != 0]
        assert greedy_hyp == [1]   # greedy takes the frame-0 bait

        tokens, lengths, scores = beam_search_batched(
            predict_step, joint_step, jnp.zeros((1, 2, 1)), enc,
            blank=0, beam_size=2, max_symbols=4, max_expansions=1,
            expand_beam=10.0)
        beam_hyp = tokens[0, 0, : int(lengths[0, 0])].tolist()
        # blank@f0 (-0.8) + emit 2 (-0.05) + blank (-2.0) = -2.85 over
        # 2 tokens; emit1 (-0.6) + blank (-0.8) + blank (-2.0) = -3.4:
        # the delayed-evidence path must win
        assert beam_hyp == [2]

    def test_variable_lengths_in_batch(self):
        table = np.full((4, 3), -5.0, np.float32)
        table[:, 1] = -0.01
        predict, joint = make_stateless_model(table)
        enc = jnp.asarray(np.stack([table, table]))
        tokens, lengths, _ = beam_search_batched(
            predict, joint, None, enc,
            rel_lengths=jnp.asarray([1.0, 0.5]), blank=0, beam_size=2,
            max_symbols=8, max_expansions=1)
        assert int(lengths[0, 0]) == 4
        assert int(lengths[1, 0]) == 2


class TestExactBeamTermination:
    def test_terminates_on_uniform_model(self, rng):
        """The safety valve must prevent the A* loop from exploding on
        a near-uniform (untrained) model."""
        from tsasr_tpu.decoding.beam import TransducerBeamSearcher
        from tsasr_tpu.models.transducer import (
            TSTransducer,
            TSTransducerConfig,
        )
        cfg = TSTransducerConfig(
            vocab_size=8, encoder_num_layers=1, d_model=32, nhead=4,
            d_ffn=64, joint_dim=48, decoder_neurons=24, dropout=0.0,
            injection_mode=None, use_speaker_encoder=False)
        model = TSTransducer(cfg)
        feats = jnp.asarray(rng.normal(size=(1, 20, 80)), jnp.float32)
        rel = jnp.ones(1)
        tokens_bos = jnp.zeros((1, 3), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, rel,
                            tokens_bos)
        _, enc = model.apply(params, feats, rel, tokens_bos)
        searcher = TransducerBeamSearcher(model, params, 0, beam_size=4,
                                          nbest=1)
        hyps, score, _, _ = searcher(enc, rel)
        assert len(hyps) == 1  # returned at all = termination
