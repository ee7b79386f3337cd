"""Inference interfaces: offline transcription + chunked streaming."""

from tsasr_tpu.inference.transcriber import TSASRTranscriber  # noqa: F401
from tsasr_tpu.inference.streaming import StreamingTranscriber  # noqa: F401
