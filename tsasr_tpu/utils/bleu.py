"""Corpus BLEU, natively.

The reference delegates to sacrebleu (``utils/bleu.py:96-121``); this
module computes standard corpus BLEU (Papineni et al. 2002) directly:
clipped modified n-gram precisions up to order 4 pooled over the corpus,
geometric mean, multiplicative brevity penalty, with multi-reference
support (per-position max clip counts, closest-length reference for BP).
``BLEUStats`` keeps the reference accumulator interface
(append/summarize/write_stats, ``utils/bleu.py:28-135``).
"""

import math
from collections import Counter


def _ngram_counts(tokens, n):
    return Counter(tuple(tokens[i:i + n]) for i in
                   range(len(tokens) - n + 1))


def corpus_bleu(hypotheses, references_list, max_order=4):
    """Corpus-level BLEU.

    ``hypotheses``: list of token lists (or strings, split on spaces).
    ``references_list``: list of reference *sets*: one list of token
    lists per hypothesis position — OR sacrebleu-style transposed input
    (R lists each of len(hypotheses)); both orientations are accepted
    when unambiguous via :func:`transpose_references`.

    Returns a dict: BLEU (percent), BP, precisions (percent, per order),
    hyp_len, ref_len, ratio.
    """
    hyps = [h.split() if isinstance(h, str) else list(h)
            for h in hypotheses]
    refs_per_hyp = [[r.split() if isinstance(r, str) else list(r)
                     for r in refs] for refs in references_list]
    if len(refs_per_hyp) != len(hyps):
        raise ValueError(
            f"{len(hyps)} hypotheses but {len(refs_per_hyp)} reference "
            "sets — transpose with transpose_references() first")

    match = [0] * max_order
    total = [0] * max_order
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hyps, refs_per_hyp):
        hyp_len += len(hyp)
        # closest reference length (ties -> shorter), sacrebleu/NIST BP
        ref_len += min((abs(len(r) - len(hyp)), len(r))
                       for r in refs)[1]
        for n in range(1, max_order + 1):
            hyp_counts = _ngram_counts(hyp, n)
            if not hyp_counts:
                continue
            max_ref = Counter()
            for r in refs:
                for gram, c in _ngram_counts(r, n).items():
                    max_ref[gram] = max(max_ref[gram], c)
            total[n - 1] += sum(hyp_counts.values())
            match[n - 1] += sum(min(c, max_ref[gram])
                                for gram, c in hyp_counts.items())

    precisions = [100.0 * m / t if t else 0.0
                  for m, t in zip(match, total)]
    if min(match) > 0:
        log_avg = sum(math.log(p / 100.0) for p in precisions) / max_order
        geo_mean = math.exp(log_avg)
    else:
        geo_mean = 0.0
    bp = 1.0 if hyp_len >= ref_len else (
        math.exp(1.0 - ref_len / hyp_len) if hyp_len > 0 else 0.0)
    return {
        "BLEU": 100.0 * bp * geo_mean,
        "BP": bp,
        "precisions": precisions,
        "hyp_len": hyp_len,
        "ref_len": ref_len,
        "ratio": hyp_len / ref_len if ref_len else 0.0,
    }


def transpose_references(targets):
    """sacrebleu orientation (R streams x N sentences) -> per-hypothesis
    reference sets (N x R)."""
    return [list(refs) for refs in zip(*targets)]


class BLEUStats:
    """Accumulator with the reference's interface
    (``utils/bleu.py:28-135``): ``append(ids, predict, targets)`` where
    ``targets`` is a list of reference streams (each a list over the
    batch, possibly several references per sentence)."""

    def __init__(self, lang="en", merge_words=True):
        self.merge_words = merge_words
        self.clear()

    def clear(self):
        self.ids = []
        self.predicts = []
        self.targets = None
        self.summary = {}

    def append(self, ids, predict, targets, ind2lab=None):
        self.ids.extend(ids)
        if ind2lab is not None:
            predict = ind2lab(predict)
            targets = [ind2lab(t) for t in targets]
        if self.merge_words:
            predict = [" ".join(seq) for seq in predict]
            targets = [[" ".join(seq) for seq in t] for t in targets]
        self.predicts.extend(predict)
        if self.targets is None:
            self.targets = [list(t) for t in targets]
        else:
            if len(self.targets) != len(targets):
                raise ValueError("reference stream count changed")
            for acc, t in zip(self.targets, targets):
                acc.extend(t)

    def summarize(self, field=None):
        scores = corpus_bleu(self.predicts,
                             transpose_references(self.targets or []))
        self.summary = dict(scores)
        self.summary["bleu_score"] = self.summary["BLEU"]
        if field is not None:
            return self.summary[field]
        return self.summary

    def write_stats(self, filestream):
        if not self.summary:
            self.summarize()
        print("BLEU = {BLEU:.2f} (BP={BP:.3f}, ratio={ratio:.3f}, "
              "hyp_len={hyp_len}, ref_len={ref_len})".format(
                  **self.summary), file=filestream)
        print("precisions:", " ".join(
            f"{p:.1f}" for p in self.summary["precisions"]),
            file=filestream)
