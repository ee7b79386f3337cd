"""HMM forced alignment: forward scoring + Viterbi alignment.

TPU-native re-implementation of the reference ``HMMAligner``
(``vendor/speechbrain/speechbrain/alignment/aligner.py:17-1322``):
a left-to-right HMM over the phoneme sequence (optionally several
states per phoneme) with self-loop/advance transitions normalized to
log(1/2) each (last state: self-loop only), all probability mass on the
first state initially, forward scores summed over all states at the last
frame and Viterbi terminating in the last state — the reference's exact
conventions, including relative-length rounding (``(lens * T).round()``).

Redesign: the reference multiplies full (U, U) transition matrices in
log space per frame (``batch_log_matvecmul``); the transition structure
is a 2-band matrix, so here each frame is O(U) elementwise work inside
one ``lax.scan`` over time — no U^2 matmuls, no Python time loop.
Backtrace runs as a reversed scan on device; host code only trims and
maps states to phoneme ids.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e5
LOG_HALF = math.log(0.5)


def _banded_transitions(phn_lens_abs, U):
    """Self-loop / advance log-probs per state, shaped (B, U).

    Matches the reference ``_make_trans_prob`` (log_softmax over the
    {self, next} row): log(1/2) both for interior states, 0 self-loop
    for the final state, NEG_INF outside the sequence.
    """
    u = jnp.arange(U)[None, :]
    last = phn_lens_abs[:, None] - 1
    self_lp = jnp.where(u < last, LOG_HALF,
                        jnp.where(u == last, 0.0, NEG_INF))
    adv_lp = jnp.where(u < last, LOG_HALF, NEG_INF)  # u -> u+1
    return self_lp, adv_lp


def _gather_emissions(emission_pred, phns, lens_abs, phn_lens_abs):
    """(B, T, V) posteriors -> (B, T, U) in phn order, masked like the
    reference ``_make_emiss_pred_useful`` (frames past lens -> 0,
    states past phn_lens -> NEG_INF)."""
    B, T, V = emission_pred.shape
    U = phns.shape[1]
    onehot = jax.nn.one_hot(phns, V, dtype=emission_pred.dtype)
    em = jnp.einsum("btv,buv->btu", emission_pred, onehot)
    t_mask = jnp.arange(T)[None, :, None] < lens_abs[:, None, None]
    em = jnp.where(t_mask, em, 0.0)
    u_mask = jnp.arange(U)[None, None, :] < phn_lens_abs[:, None, None]
    return jnp.where(u_mask, em, NEG_INF)


def _shift_down(x, fill):
    """x[:, u] -> x[:, u-1] view: state u receives from u-1."""
    return jnp.concatenate(
        [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


class HMMAligner:
    """Forward / Viterbi alignment with the reference's call signature:
    ``aligner(emission_pred, lens, phns, phn_lens, dp_algorithm)``.

    ``dp_algorithm='forward'`` -> (B,) log-likelihoods;
    ``'viterbi'`` -> ((B,) path scores, list of per-frame phone-id
    lists trimmed to each utterance's length).
    """

    def __init__(self, states_per_phoneme=1, neg_inf=NEG_INF,
                 batch_reduction="none", input_len_norm=False,
                 target_len_norm=False):
        self.states_per_phoneme = states_per_phoneme
        self.neg_inf = neg_inf
        self.batch_reduction = batch_reduction
        self.input_len_norm = input_len_norm
        self.target_len_norm = target_len_norm
        self.align_dict = {}

    # ------------------------------------------------------------- public
    def __call__(self, emission_pred, lens, phns, phn_lens, dp_algorithm):
        emission_pred = jnp.asarray(emission_pred, jnp.float32)
        lens = jnp.asarray(lens)
        phns = jnp.asarray(phns, jnp.int32)
        phn_lens = jnp.asarray(phn_lens)
        T = emission_pred.shape[1]
        U = phns.shape[1]
        lens_abs = jnp.round(lens * T).astype(jnp.int32)
        phn_lens_abs = jnp.round(phn_lens * U).astype(jnp.int32)

        if dp_algorithm == "forward":
            scores = _forward_jit(emission_pred, phns, lens_abs,
                                  phn_lens_abs)
            return self._reduce(scores, lens_abs, phn_lens_abs)
        if dp_algorithm == "viterbi":
            scores, locs = _viterbi_jit(emission_pred, phns, lens_abs,
                                        phn_lens_abs)
            locs = np.asarray(locs)
            phns_np = np.asarray(phns)
            lens_np = np.asarray(lens_abs)
            alignments = [
                [int(phns_np[b, locs[b, t]]) for t in range(lens_np[b])]
                for b in range(phns_np.shape[0])]
            return self._reduce(scores, lens_abs, phn_lens_abs), \
                alignments
        raise ValueError(
            "dp_algorithm must be 'forward' or 'viterbi'")

    def _reduce(self, scores, lens_abs, phn_lens_abs):
        if self.input_len_norm:
            scores = scores / jnp.maximum(lens_abs, 1)
        if self.target_len_norm:
            scores = scores / jnp.maximum(phn_lens_abs, 1)
        if self.batch_reduction == "sum":
            return jnp.sum(scores)
        if self.batch_reduction == "mean":
            return jnp.mean(scores)
        return scores

    # -------------------------------------------- states-per-phoneme API
    def expand_phns_by_states_per_phoneme(self, phns, phn_lens):
        """Repeat each phoneme ``states_per_phoneme`` times (reference
        :938-984): phone p -> states p*S .. p*S + S-1."""
        S = self.states_per_phoneme
        phns = np.asarray(phns, np.int64)
        B, U = phns.shape
        lens_abs = np.round(np.asarray(phn_lens) * U).astype(np.int64)
        out = np.zeros((B, U * S), np.int64)
        for b in range(B):
            expanded = [p * S + k for p in phns[b, :lens_abs[b]]
                        for k in range(S)]
            out[b, :len(expanded)] = expanded
        return jnp.asarray(out), jnp.asarray(lens_abs * S / (U * S))

    def collapse_alignments(self, alignments):
        """Inverse of the expansion: state ids -> phone ids, dropping
        repeated sub-states only by integer division (reference
        :1275-1312 keeps the frame-level sequence)."""
        S = self.states_per_phoneme
        return [[s // S for s in ali] for ali in alignments]

    # --------------------------------------------------- viterbi training
    def store_alignments(self, ids, alignments):
        """Keep per-utterance alignments for later reuse (reference
        :986-1012)."""
        for ID, ali in zip(ids, alignments):
            self.align_dict[ID] = np.asarray(ali, np.int64)

    def get_prev_alignments(self, ids, emission_pred, lens, phns,
                            phn_lens):
        """Batch of stored (or flat-start) alignments as (B, T) targets
        (reference :1107-1162; flat start = uniform segmentation)."""
        T = emission_pred.shape[1]
        lens_abs = np.round(np.asarray(lens) * T).astype(np.int64)
        U = phns.shape[1]
        phn_lens_abs = np.round(np.asarray(phn_lens) * U).astype(np.int64)
        phns_np = np.asarray(phns)
        out = np.zeros((len(ids), T), np.int64)
        for b, ID in enumerate(ids):
            if ID in self.align_dict:
                ali = self.align_dict[ID][:lens_abs[b]]
            else:
                # flat start: equal spans per phoneme
                n, u = int(lens_abs[b]), int(phn_lens_abs[b])
                idx = np.minimum((np.arange(n) * u) // max(n, 1), u - 1)
                ali = phns_np[b, idx]
            out[b, :len(ali)] = ali
        return jnp.asarray(out)

    def calc_accuracy(self, alignments, ends, phns, ind2labs=None):
        """Mean frame accuracy of predicted vs ground-truth alignments
        built from (end-frame, phoneme) pairs (reference :1216-1273)."""
        accs = []
        for ali, end, phn in zip(alignments, ends, phns):
            gt = []
            prev = 0
            for e, p in zip(end, phn):
                gt.extend([p] * (e - prev))
                prev = e
            n = min(len(ali), len(gt))
            if n == 0:
                continue
            accs.append(float(np.mean(
                np.asarray(ali[:n]) == np.asarray(gt[:n]))) * 100.0)
        return float(np.mean(accs)) if accs else 0.0


@jax.jit
def _forward_jit(emission_pred, phns, lens_abs, phn_lens_abs):
    B, T, V = emission_pred.shape
    U = phns.shape[1]
    em = _gather_emissions(emission_pred, phns, lens_abs, phn_lens_abs)
    self_lp, adv_lp = _banded_transitions(phn_lens_abs, U)

    alpha0 = jnp.where(jnp.arange(U)[None] == 0, em[:, 0, :], NEG_INF)

    def step(alpha, t):
        stay = alpha + self_lp
        enter = _shift_down(alpha + adv_lp, NEG_INF)
        new = jnp.logaddexp(stay, enter) + em[:, t, :]
        new = jnp.maximum(new, NEG_INF)
        # freeze finished sequences (reference: identity transitions +
        # zero emissions past lens)
        keep = (t < lens_abs)[:, None]
        return jnp.where(keep, new, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    return jax.scipy.special.logsumexp(alpha, axis=1)


@jax.jit
def _viterbi_jit(emission_pred, phns, lens_abs, phn_lens_abs):
    B, T, V = emission_pred.shape
    U = phns.shape[1]
    em = _gather_emissions(emission_pred, phns, lens_abs, phn_lens_abs)
    self_lp, adv_lp = _banded_transitions(phn_lens_abs, U)

    v0 = jnp.where(jnp.arange(U)[None] == 0, em[:, 0, :], NEG_INF)

    def step(v, t):
        stay = v + self_lp
        enter = _shift_down(v + adv_lp, NEG_INF)
        take_enter = enter > stay                     # (B, U) bool
        new = jnp.maximum(jnp.maximum(stay, enter) + em[:, t, :],
                          NEG_INF)
        keep = (t < lens_abs)[:, None]
        return jnp.where(keep, new, v), jnp.where(keep, take_enter,
                                                  False)

    v, from_below = jax.lax.scan(step, v0, jnp.arange(1, T))
    # from_below[t-1] are the backpointers INTO frame t
    scores = v[jnp.arange(B), phn_lens_abs - 1]

    # reversed scan backtrace: state at each frame, walking from the
    # final state at each sequence's last frame
    def back(loc, t):
        bp = from_below[t - 1]                         # (B, U) bool
        came_below = jnp.take_along_axis(bp, loc[:, None], axis=1)[:, 0]
        prev = jnp.where(came_below, loc - 1, loc)
        # before a sequence starts contributing (t >= lens), hold final
        active = t <= lens_abs - 1
        prev = jnp.where(active, prev, loc)
        return prev, loc

    final_loc = phn_lens_abs - 1
    loc0, locs_rev = jax.lax.scan(back, final_loc,
                                  jnp.arange(T - 1, 0, -1))
    # locs_rev[i] is the state at frame t = T-1-i; the final carry is
    # the state at frame 0
    locs = jnp.concatenate([loc0[None], jnp.flip(locs_rev, axis=0)],
                           axis=0)                     # (T, B)
    return scores, jnp.transpose(locs)