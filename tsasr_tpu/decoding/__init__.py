"""Transducer decoding: on-device greedy scan + beam search."""

from tsasr_tpu.decoding.greedy import TransducerGreedySearcher, greedy_decode  # noqa: F401
from tsasr_tpu.decoding.beam import TransducerBeamSearcher  # noqa: F401
from tsasr_tpu.decoding.beam_batched import BatchedBeamSearcher  # noqa: F401
