"""CTC forced alignment (Viterbi over the blank-interleaved graph).

Reference surface: ``vendor/speechbrain/speechbrain/alignment/``
(HMMAligner's Viterbi forced alignment; SpeechBrain aligns with HMM
emission/transition models — the CTC topology below is the same machine
with CTC's fixed transitions). Given per-frame log-probs and a target
token sequence, find the most probable alignment path and the per-token
frame spans.

The lattice is the standard CTC state graph: states
``[blank, y1, blank, y2, ..., yU, blank]`` (2U+1); transitions stay /
advance-1 / advance-2 (the skip allowed only between distinct labels).
Dynamic programming runs as a ``lax.scan`` over frames entirely on
device; the backtrace is decoded on host from the argmax choices.
"""

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def _expand_targets(targets, blank):
    """(U,) -> (2U+1,) blank-interleaved state labels."""
    targets = np.asarray(targets, np.int64)
    states = np.full(2 * len(targets) + 1, blank, np.int64)
    states[1::2] = targets
    return states


def ctc_forced_align(log_probs, targets, blank_index=0):
    """Most probable CTC alignment of ``targets`` to ``log_probs``.

    Arguments
    ---------
    log_probs : (T, V) per-frame log-probs.
    targets : (U,) token ids (no blanks).
    blank_index : blank id.

    Returns
    -------
    path : (T,) int64 emitted symbol per frame (blank or target token).
    score : float, log-prob of the best alignment.
    """
    log_probs = jnp.asarray(log_probs)
    T = log_probs.shape[0]
    if len(targets) == 0:
        # degenerate case: the only alignment is all blanks
        path = np.full(T, blank_index, np.int64)
        score = float(jnp.sum(log_probs[:, blank_index]))
        return path, score
    states = _expand_targets(targets, blank_index)
    S = len(states)
    # too few frames for the required emissions -> the DP naturally
    # yields -inf scores (NEG) at the terminal states
    state_lp = log_probs[:, jnp.asarray(states)]        # (T, S)

    # allowed skip (advance-2): from s-2 to s when states differ and the
    # intermediate state is a blank (always true for odd s)
    can_skip = np.zeros(S, bool)
    for s in range(2, S):
        can_skip[s] = (s % 2 == 1) and states[s] != states[s - 2]
    can_skip = jnp.asarray(can_skip)

    def shift(x, k):
        return jnp.concatenate([jnp.full((k,), NEG), x[:-k]])

    def step(alpha, lp_t):
        stay = alpha
        adv1 = shift(alpha, 1)
        adv2 = jnp.where(can_skip, shift(alpha, 2), NEG)
        stacked = jnp.stack([stay, adv1, adv2])          # (3, S)
        best = jnp.max(stacked, axis=0)
        choice = jnp.argmax(stacked, axis=0)             # 0/1/2
        return best + lp_t, choice

    alpha0 = jnp.full((S,), NEG).at[0].set(state_lp[0, 0])
    if S > 1:
        alpha0 = alpha0.at[1].set(state_lp[0, 1])
    alpha, choices = jax.lax.scan(step, alpha0, state_lp[1:])
    choices = np.asarray(choices)                        # (T-1, S)

    # end in the last blank or last label
    ends = [S - 1] + ([S - 2] if S > 1 else [])
    alpha_np = np.asarray(alpha)
    end = max(ends, key=lambda s: alpha_np[s])
    score = float(alpha_np[end])

    # host backtrace
    s = end
    state_path = [s]
    for t in range(T - 2, -1, -1):
        s = s - int(choices[t, s])
        state_path.append(s)
    state_path.reverse()
    path = np.asarray([states[s] for s in state_path], np.int64)
    return path, score


def ctc_token_spans(log_probs, targets, blank_index=0):
    """-> list of (token, start_frame, end_frame_exclusive) for each
    target token, from the forced alignment path."""
    path, score = ctc_forced_align(log_probs, targets, blank_index)
    targets = list(np.asarray(targets))
    spans = []
    idx = 0
    t = 0
    T = len(path)
    while t < T and idx < len(targets):
        if path[t] == targets[idx]:
            start = t
            while t < T and path[t] == targets[idx]:
                t += 1
                # a repeated label needs a blank between occurrences;
                # the path carries that structure already
            spans.append((int(targets[idx]), start, t))
            idx += 1
        else:
            t += 1
    return spans, score
