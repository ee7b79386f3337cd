"""Decoding: transducer greedy/beam, CTC, and seq2seq (AED) searchers."""

from tsasr_tpu.decoding.greedy import TransducerGreedySearcher, greedy_decode  # noqa: F401
from tsasr_tpu.decoding.beam import TransducerBeamSearcher  # noqa: F401
from tsasr_tpu.decoding.beam_batched import BatchedBeamSearcher  # noqa: F401
from tsasr_tpu.decoding.ctc import (  # noqa: F401
    CTCPrefixScorer,
    ctc_greedy_decode,
    ctc_prefix_beam_search,
    ctc_prefix_beam_search_batch,
)
from tsasr_tpu.decoding.seq2seq import (  # noqa: F401
    S2SBeamSearcher,
    S2SGreedySearcher,
    s2s_beam_search,
    s2s_greedy_search,
)
