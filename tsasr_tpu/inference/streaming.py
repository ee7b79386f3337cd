"""Chunked streaming transcription for causal models.

The reference's streaming story is *causality* (causal conv frontend +
lookahead-masked attention, SURVEY.md §5.7) but it ships no streaming
runtime. This module adds one: audio arrives in chunks, and the decoder
state (emitted tokens + prediction-network state) carries across chunks,
so partial transcripts are available with chunk latency.

Strategy (re-encode with history): a causal encoder's frame ``t`` output
depends only on frames ``<= t``, so re-encoding the accumulated feature
history and greedy-decoding only the *new* encoder frames is exactly
equivalent to offline greedy decoding — the test pins this equivalence.
``max_history_seconds`` bounds the re-encoded window for long streams
(beyond it, outputs may differ from offline decoding only through the
truncated attention context). Per-layer KV/conv caching is the planned
constant-time refinement; the emission semantics would be unchanged.
"""

import numpy as np

import jax
import jax.numpy as jnp


class StreamingTranscriber:
    """Stateful chunk-by-chunk transcription (single stream).

    ``mode="reencode"`` (default) re-encodes the accumulated history each
    chunk — exact for causal models, O(T) per chunk.
    ``mode="kv_cache"`` keeps per-layer attention K/V + conv + frontend
    caches and encodes only the new frames — constant cost per chunk
    (requires a causal model; feature normalization is disabled since
    utterance-global sentence stats are inherently non-streaming).
    """

    def __init__(self, model, params, tokenizer, sample_rate=16000,
                 n_fft=512, n_mels=80, win_length=32.0, hop_ms=10.0,
                 blank_index=0, speaker_embs=None,
                 max_history_seconds=None, mode="reencode",
                 kv_capacity_seconds=60.0):
        from tsasr_tpu.ops import Fbank
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop = int(round(sample_rate / 1000.0 * hop_ms))
        self.blank = blank_index
        self.speaker_embs = speaker_embs
        self.mode = mode
        self.max_history = (int(max_history_seconds * sample_rate)
                            if max_history_seconds else None)
        self.kv_capacity = int(kv_capacity_seconds * sample_rate
                               / self.hop / 4) + 8
        self.fbank = Fbank(sample_rate=sample_rate, n_fft=n_fft,
                           n_mels=n_mels, win_length=win_length)
        # STFT center-padding contaminates the last ceil((n_fft/2)/hop)
        # feature frames of a partial signal (they see zeros where future
        # audio belongs); hold the affected encoder frames back until the
        # next chunk (or finalize) provides the real samples.
        contaminated_feat = -(-(n_fft // 2) // self.hop) + 1
        self.holdback = -(-contaminated_feat // 4)    # 4x subsampling
        self.reset()

    def reset(self):
        self._audio = np.zeros(0, np.float32)
        self._decoded_frames = 0      # global encoder frames consumed
        self._dropped_samples = 0     # history trimmed off the window
        self._tokens = []
        self._pn_state = None
        self._dec_out = None
        self._enc_state = None        # kv_cache mode
        self._feat_frames_done = 0
        self._total_samples = 0

    # ----------------------------------------------------------- chunks
    def accept_chunk(self, chunk, final=False):
        """Feed new audio; returns the transcript-so-far (partial)."""
        if self.mode == "kv_cache":
            return self._accept_chunk_kv(chunk, final)
        chunk = np.asarray(chunk, np.float32)
        self._audio = np.concatenate([self._audio, chunk])
        if self.max_history and len(self._audio) > self.max_history:
            # trim hop-aligned so encoder frame indices stay aligned
            drop = len(self._audio) - self.max_history
            drop -= drop % (4 * self.hop)   # 4x frontend subsampling
            self._audio = self._audio[drop:]
            self._dropped_samples += drop

        window_start = self._enc_frames(self._dropped_samples) \
            if self._dropped_samples else 0
        enc = self._encode(jnp.asarray(self._audio)[None])
        new_lo = self._decoded_frames - window_start
        hi = enc.shape[1] if final else \
            max(enc.shape[1] - self.holdback, 0)
        if new_lo < hi:
            self._greedy_frames(enc[:, max(new_lo, 0): hi])
            self._decoded_frames = window_start + hi
        return self.partial_transcript()

    def finalize(self):
        """End of stream: decode the held-back tail frames, return the
        final transcript."""
        if self.mode == "kv_cache" or len(self._audio):
            self.accept_chunk(np.zeros(0, np.float32), final=True)
        return self.partial_transcript()

    # ----------------------------------------------- kv_cache fast path
    def _accept_chunk_kv(self, chunk, final=False):
        """Constant-cost chunk: compute only the NEW complete feature
        frames (audio ring buffer), stream them through the cached
        encoder, greedy-decode the new encoder frames."""
        chunk = np.asarray(chunk, np.float32)
        self._audio = np.concatenate([self._audio, chunk])
        self._total_samples += len(chunk)
        half = self.n_fft // 2

        # frame f covers samples [f*hop - half, f*hop + half)
        if final:
            # offline center padding: pad half zeros on the right
            self._audio = np.concatenate(
                [self._audio, np.zeros(half, np.float32)])
            self._total_samples += half
            f_avail = 1 + (self._total_samples - self.n_fft
                           + half) // self.hop
        else:
            f_avail = (self._total_samples - half) // self.hop + 1
        n_new = f_avail - self._feat_frames_done
        if not final:
            n_new -= n_new % 4        # frontend consumes multiples of 4
        if final:
            n_new -= n_new % 4        # drop the sub-stride tail
        if n_new <= 0:
            return self.partial_transcript()

        # slice the audio covering the new frames (left context included)
        f_lo = self._feat_frames_done
        samp_lo = f_lo * self.hop - half
        samp_hi = (f_lo + n_new - 1) * self.hop + half
        buf_offset = self._total_samples - len(self._audio)
        lo = samp_lo - buf_offset
        window = self._audio[max(lo, 0): samp_hi - buf_offset]
        if lo < 0:                    # stream start: offline left pad
            window = np.concatenate([np.zeros(-lo, np.float32), window])

        feats = self._frames_to_feats(window, n_new)
        if self._enc_state is None:
            self._enc_state = self.model.apply(
                self.params, 1, self.kv_capacity,
                method=self.model.init_stream_state)
        enc_new, self._enc_state = self.model.apply(
            self.params, feats, self._enc_state,
            self.speaker_embs, None, method=self.model.encode_stream)
        self._greedy_frames(enc_new)
        self._feat_frames_done += n_new

        # drop consumed audio (keep the overlap context)
        keep_from = (self._feat_frames_done * self.hop - half) \
            - buf_offset
        if keep_from > 0:
            self._audio = self._audio[keep_from:]
        return self.partial_transcript()

    def _frames_to_feats(self, window, n_frames):
        """Exact fbank frames from a raw sample window (no center pad:
        the window already carries the context)."""
        from tsasr_tpu.ops.features import stft as stft_op
        from tsasr_tpu.ops.features import spectral_magnitude
        wav = jnp.asarray(window)[None]
        re, im = stft_op(wav, sample_rate=self.sample_rate,
                         win_length=self.n_fft * 1000.0 / self.sample_rate,
                         hop_length=self.hop * 1000.0 / self.sample_rate,
                         n_fft=self.n_fft, center=False)
        mag = spectral_magnitude(re, im)
        from tsasr_tpu.ops.features import amplitude_to_db
        fbanks = jnp.matmul(mag, jnp.asarray(self.fbank._mel))
        fbanks = amplitude_to_db(fbanks)
        return fbanks[:, :n_frames]

    def partial_transcript(self):
        return " ".join(self.tokenizer.decode_ids_to_words(self._tokens))

    # ------------------------------------------------------------ device
    def _enc_frames(self, num_samples):
        """Encoder frames produced by a prefix of this many samples."""
        feat = 1 + num_samples // self.hop
        half = -(-feat // 2)
        return -(-half // 2)

    def _encode(self, wav):
        from tsasr_tpu.ops import input_normalization
        rel = jnp.ones((1,), jnp.float32)
        feats = input_normalization(self.fbank(wav), rel)
        return self.model.apply(self.params, feats, rel,
                                self.speaker_embs, None,
                                method=self.model.encode)

    def _greedy_frames(self, enc_frames):
        """Advance greedy decoding over new encoder frames, carrying the
        prediction-network state."""
        if self._pn_state is None:
            self._pn_state = self.model.apply(
                self.params, 1,
                method=self.model.predictor_initial_state)
            last = self._tokens[-1] if self._tokens else self.blank
            self._dec_out, self._pn_state = self.model.apply(
                self.params, jnp.asarray([last], jnp.int32),
                self._pn_state, method=self.model.predict_step)
        T = enc_frames.shape[1]
        for t in range(T):
            logits = self.model.apply(
                self.params, enc_frames[:, t][:, None, :],
                self._dec_out[:, None, :],
                method=self.model.joint_logits)[0, 0]       # (V,)
            token = int(jnp.argmax(logits))
            if token != self.blank:
                self._tokens.append(token)
                self._dec_out, self._pn_state = self.model.apply(
                    self.params, jnp.asarray([token], jnp.int32),
                    self._pn_state, method=self.model.predict_step)
