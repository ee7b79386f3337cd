"""Count-based (backoff n-gram) language modeling.

TPU-native equivalent of the reference ``speechbrain/lm/`` package
(``lm/counting.py:1-162``, ``lm/ngram.py:1-200``, ``lm/arpa.py:1-229``):
n-gram counting, backoff-model estimation (beyond the reference, which
ships only counting primitives), ARPA read/write, perplexity evaluation,
and a jit-safe dense fusion scorer for the on-device beams.
"""

from tsasr_tpu.lm.arpa import read_arpa, write_arpa
from tsasr_tpu.lm.counting import (
    count_ngrams,
    ngrams,
    ngrams_for_evaluation,
    pad_ends,
)
from tsasr_tpu.lm.fusion import dense_ngram_table, make_ngram_lm_step_fn
from tsasr_tpu.lm.ngram import (
    BackoffNgramLM,
    ngram_evaluation_details,
    ngram_perplexity,
    train_backoff_ngram,
)

__all__ = [
    "BackoffNgramLM",
    "count_ngrams",
    "dense_ngram_table",
    "make_ngram_lm_step_fn",
    "ngram_evaluation_details",
    "ngram_perplexity",
    "ngrams",
    "ngrams_for_evaluation",
    "pad_ends",
    "read_arpa",
    "train_backoff_ngram",
    "write_arpa",
]
