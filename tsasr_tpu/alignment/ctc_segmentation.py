"""CTC segmentation: locate utterance segments in long audio.

Capability equivalent of the reference's
``alignment/ctc_segmentation.py:136-770`` (a wrapper over the
ctc-segmentation package, Kuerzinger et al. 2020): given frame-level CTC
log-posteriors for a long recording and the list of utterance token
sequences spoken in order, produce per-utterance (start_time, end_time,
confidence) and optionally reject bad segments.

Built on this framework's own CTC forced-alignment scan
(``alignment/ctc_align.py``): the utterance token sequences are
concatenated into one target sequence (CTC's blank-interleaved topology
already permits arbitrary silence between tokens), Viterbi-aligned on
device in one pass, and utterance boundaries/confidences read off the
aligned token spans.
"""

from dataclasses import dataclass, field
from typing import List

import numpy as np

from tsasr_tpu.alignment.ctc_align import ctc_token_spans


@dataclass
class CTCSegmentationTask:
    """Result container (reference ``CTCSegmentationTask``)."""

    name: str = "utt"
    utt_ids: List[str] = field(default_factory=list)
    segments: list = field(default_factory=list)   # (start_s, end_s, conf)
    text: list = field(default_factory=list)
    done: bool = False

    def __str__(self):
        lines = []
        for utt, (start, end, conf), txt in zip(self.utt_ids,
                                                self.segments, self.text):
            lines.append(f"{utt} {self.name} {start:.2f} {end:.2f} "
                         f"{conf:.4f} {txt}")
        return "\n".join(lines)


class CTCSegmentation:
    """Segment long audio with utterance transcripts.

    Arguments
    ---------
    frame_duration : float
        Seconds per CTC posterior frame (model hop * subsampling / sr).
    blank_index : int
        CTC blank id.
    min_confidence : float or None
        Segments scoring below this mean per-token probability are
        flagged (kept, but with ``conf`` reported for filtering —
        the reference's gratis scoring behavior).
    """

    def __init__(self, frame_duration, blank_index=0,
                 min_confidence=None):
        self.frame_duration = float(frame_duration)
        self.blank_index = blank_index
        self.min_confidence = min_confidence

    def __call__(self, log_probs, utterances, utt_ids=None, name="utt",
                 texts=None):
        """
        Arguments
        ---------
        log_probs : (T, V) CTC log-posteriors for the whole recording.
        utterances : list of token-id sequences, in spoken order.
        utt_ids / texts : optional labels carried into the result.

        Returns
        -------
        CTCSegmentationTask with per-utterance
        ``(start_seconds, end_seconds, confidence)``.
        """
        log_probs = np.asarray(log_probs, np.float32)
        flat = [int(t) for utt in utterances for t in utt]
        bounds = np.cumsum([0] + [len(u) for u in utterances])
        spans, _ = ctc_token_spans(log_probs, flat, self.blank_index)
        if len(spans) != len(flat):
            raise ValueError(
                f"alignment found {len(spans)} of {len(flat)} tokens — "
                "audio too short for the transcript?")

        segments = []
        for i, utt in enumerate(utterances):
            lo, hi = bounds[i], bounds[i + 1]
            if hi == lo:
                segments.append((0.0, 0.0, 0.0))
                continue
            utt_spans = spans[lo:hi]
            start_f = utt_spans[0][1]
            end_f = utt_spans[-1][2]
            # confidence: mean per-token best-frame probability
            probs = []
            for tok, s, e in utt_spans:
                probs.append(float(np.exp(
                    np.max(log_probs[s:e, tok]))))
            conf = float(np.mean(probs)) if probs else 0.0
            segments.append((start_f * self.frame_duration,
                             end_f * self.frame_duration, conf))

        task = CTCSegmentationTask(
            name=name,
            utt_ids=utt_ids or [f"{name}_{i:04d}"
                                for i in range(len(utterances))],
            segments=segments,
            text=texts or ["" for _ in utterances],
            done=True)
        return task
