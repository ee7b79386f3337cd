"""Voice Activity Detection inference interface.

Capability equivalent of the reference ``pretrained.VAD``
(``pretrained/interfaces.py:1219-2200``): frame-level speech
probabilities from any model, double thresholding with activation /
deactivation hysteresis, boundary extraction in seconds, close-segment
merging, short-segment removal, energy-based double checking, and
boundary file output.

Model-agnostic: pass ``prob_fn(wavs (B, L)) -> (B, T) speech probs`` —
e.g. a CRDNN over fbanks (``models/crdnn.py``) with a sigmoid head, or
the built-in :func:`energy_prob_fn` for an unsupervised energy VAD.
"""

import numpy as np


def energy_prob_fn(frame_len=400, hop=160, sensitivity=1.0):
    """Unsupervised energy-based probability function (the reference's
    ``energy_VAD`` normalization: chunk energies rescaled to [0, 1])."""

    def fn(wavs):
        wavs = np.asarray(wavs, np.float32)
        B, L = wavs.shape
        T = max(1, (L - frame_len) // hop + 1)
        probs = np.zeros((B, T), np.float32)
        for t in range(T):
            seg = wavs[:, t * hop: t * hop + frame_len]
            probs[:, t] = np.sqrt(np.mean(seg ** 2, axis=1) + 1e-12)
        lo = probs.min(axis=1, keepdims=True)
        hi = probs.max(axis=1, keepdims=True)
        return ((probs - lo) / np.maximum(hi - lo, 1e-9)) ** \
            (1.0 / max(sensitivity, 1e-6))

    return fn


class VAD:
    """Speech segmentation driver over a frame-probability model."""

    def __init__(self, prob_fn, frame_duration=0.01, sample_rate=16000):
        self.prob_fn = prob_fn
        self.frame_duration = float(frame_duration)
        self.sample_rate = sample_rate

    # --------------------------------------------------------- pipeline
    def get_speech_prob_chunk(self, wavs):
        """(B, L) or (L,) -> (B, T) speech probabilities."""
        arr = np.asarray(wavs, np.float32)
        if arr.ndim == 1:
            arr = arr[None]
        return np.asarray(self.prob_fn(arr))

    def apply_threshold(self, probs, activation_th=0.5,
                        deactivation_th=0.25):
        """Double-threshold hysteresis -> binary (B, T) (reference
        ``apply_threshold``): a segment starts above ``activation_th``
        and ends only when the probability drops below
        ``deactivation_th``."""
        probs = np.asarray(probs)
        out = np.zeros_like(probs, dtype=bool)
        for b in range(probs.shape[0]):
            active = False
            for t in range(probs.shape[1]):
                if not active and probs[b, t] >= activation_th:
                    active = True
                elif active and probs[b, t] < deactivation_th:
                    active = False
                out[b, t] = active
        return out

    def get_boundaries(self, prob_th, output_value="seconds"):
        """Binary frames -> list (per batch row) of (start, end)
        segments, in seconds or frames."""
        prob_th = np.asarray(prob_th, bool)
        all_bounds = []
        for row in prob_th:
            padded = np.concatenate([[False], row, [False]])
            starts = np.flatnonzero(~padded[:-1] & padded[1:])
            ends = np.flatnonzero(padded[:-1] & ~padded[1:])
            seg = np.stack([starts, ends], axis=1).astype(np.float64)
            if output_value == "seconds":
                seg = seg * self.frame_duration
            all_bounds.append(seg)
        return all_bounds if len(all_bounds) > 1 else all_bounds[0]

    def merge_close_segments(self, boundaries, close_th=0.250):
        """Merge segments separated by < close_th seconds."""
        boundaries = np.asarray(boundaries, np.float64)
        if len(boundaries) == 0:
            return boundaries
        merged = [list(boundaries[0])]
        for s, e in boundaries[1:]:
            if s - merged[-1][1] < close_th:
                merged[-1][1] = e
            else:
                merged.append([s, e])
        return np.asarray(merged)

    def remove_short_segments(self, boundaries, len_th=0.250):
        boundaries = np.asarray(boundaries, np.float64)
        if len(boundaries) == 0:
            return boundaries
        keep = (boundaries[:, 1] - boundaries[:, 0]) >= len_th
        return boundaries[keep]

    def double_check_speech_segments(self, boundaries, wav,
                                     speech_th=0.5):
        """Re-score each segment on the model; drop segments whose mean
        probability is below ``speech_th`` (reference
        ``double_check_speech_segments``)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        out = []
        for s, e in np.asarray(boundaries, np.float64):
            lo = int(s * self.sample_rate)
            hi = max(int(e * self.sample_rate), lo + 1)
            probs = self.get_speech_prob_chunk(wav[lo:hi])
            if probs.mean() >= speech_th:
                out.append([s, e])
        return np.asarray(out) if out else np.zeros((0, 2))

    def get_speech_segments(self, wav, activation_th=0.5,
                            deactivation_th=0.25, close_th=0.250,
                            len_th=0.250, double_check=False,
                            speech_th=0.5):
        """Full pipeline: wav -> (N, 2) [start, end] seconds."""
        probs = self.get_speech_prob_chunk(wav)
        binary = self.apply_threshold(probs, activation_th,
                                      deactivation_th)
        bounds = self.get_boundaries(binary)
        bounds = self.merge_close_segments(bounds, close_th)
        bounds = self.remove_short_segments(bounds, len_th)
        if double_check:
            bounds = self.double_check_speech_segments(
                bounds, wav, speech_th)
        return bounds

    def save_boundaries(self, boundaries, save_path=None,
                        audio_file=None):
        """Reference-style text output: one line per segment."""
        lines = []
        for i, (s, e) in enumerate(np.asarray(boundaries)):
            name = audio_file or "audio"
            lines.append(f"segment_{i + 1:03d}  {s:.2f}  {e:.2f}  "
                         f"SPEECH  {name}")
        text = "\n".join(lines)
        if save_path is not None:
            with open(save_path, "w") as f:
                f.write(text + "\n")
        return text
