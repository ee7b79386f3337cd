"""Forced alignment utilities."""

from tsasr_tpu.alignment.ctc_align import (  # noqa: F401
    ctc_forced_align,
    ctc_token_spans,
)
