"""VAD and spectral-mask enhancement interface tests."""

import numpy as np
import pytest

from tsasr_tpu.inference.vad import VAD, energy_prob_fn


def speech_like(segments, L=32000, sr=16000, seed=0):
    """Silence with loud bursts in the given (start_s, end_s) windows."""
    rng = np.random.default_rng(seed)
    wav = rng.normal(size=L).astype(np.float32) * 0.001
    for s, e in segments:
        lo, hi = int(s * sr), int(e * sr)
        wav[lo:hi] += rng.normal(size=hi - lo).astype(np.float32) * 0.5
    return wav


class TestVAD:
    def make_vad(self):
        return VAD(energy_prob_fn(), frame_duration=0.01)

    def test_recovers_segments(self):
        vad = self.make_vad()
        truth = [(0.4, 0.8), (1.2, 1.7)]
        wav = speech_like(truth)
        bounds = vad.get_speech_segments(wav, activation_th=0.4,
                                         deactivation_th=0.2)
        assert len(bounds) == 2
        for (s, e), (ts, te) in zip(bounds, truth):
            assert abs(s - ts) < 0.06 and abs(e - te) < 0.06

    def test_hysteresis(self):
        vad = self.make_vad()
        probs = np.asarray([[0.1, 0.6, 0.4, 0.3, 0.2, 0.6, 0.1]])
        binary = vad.apply_threshold(probs, activation_th=0.5,
                                     deactivation_th=0.25)
        # stays active through 0.4/0.3 (above deactivation), drops at
        # 0.2, reactivates at 0.6
        assert list(binary[0]) == [False, True, True, True, False,
                                   True, False]

    def test_merge_and_remove(self):
        vad = self.make_vad()
        b = np.asarray([[0.0, 0.5], [0.6, 1.0], [2.0, 2.05]])
        merged = vad.merge_close_segments(b, close_th=0.2)
        assert merged.shape == (2, 2)
        np.testing.assert_allclose(merged[0], [0.0, 1.0])
        cleaned = vad.remove_short_segments(merged, len_th=0.25)
        assert cleaned.shape == (1, 2)

    def test_double_check_drops_silence(self):
        vad = self.make_vad()
        truth = [(0.4, 0.8)]
        wav = speech_like(truth)
        bounds = np.asarray([[0.4, 0.8], [1.5, 1.9]])  # 2nd is silence
        checked = vad.double_check_speech_segments(bounds, wav,
                                                   speech_th=0.5)
        assert checked.shape == (1, 2)

    def test_save_boundaries(self, tmp_path):
        vad = self.make_vad()
        path = str(tmp_path / "bounds.txt")
        text = vad.save_boundaries(np.asarray([[0.1, 0.9]]),
                                   save_path=path, audio_file="x.wav")
        assert "SPEECH" in text
        assert open(path).read().count("segment_") == 1


class TestEnhancement:
    def test_identity_mask_roundtrip(self):
        import jax.numpy as jnp
        from tsasr_tpu.inference.enhancement import \
            SpectralMaskEnhancement

        rng = np.random.default_rng(1)
        wav = rng.normal(size=(1, 16000)).astype(np.float32) * 0.1
        enh = SpectralMaskEnhancement(
            mask_fn=lambda params, log_mag: jnp.ones_like(log_mag),
            params={}, n_fft=512, win_length=32.0)
        out = np.asarray(enh.enhance_batch(wav))
        # all-ones mask ~ identity (up to STFT edge effects)
        err = np.abs(out[0, 800:-800] - wav[0, 800:-800]).mean()
        assert err < 2e-3

    def test_zero_mask_silence_and_tone_denoise(self):
        import jax.numpy as jnp
        from tsasr_tpu.inference.enhancement import \
            SpectralMaskEnhancement

        rng = np.random.default_rng(2)
        sr = 16000
        t = np.arange(sr) / sr
        clean = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.3
        noisy = clean + rng.normal(size=sr).astype(np.float32) * 0.1

        # oracle-ish mask: keep only bins near 440 Hz
        def mask_fn(params, log_mag):
            F = log_mag.shape[-1]
            f_bin = int(round(440 / sr * 512))
            mask = jnp.zeros_like(log_mag)
            return mask.at[..., f_bin - 2: f_bin + 3].set(1.0)

        enh = SpectralMaskEnhancement(mask_fn, {}, n_fft=512,
                                      win_length=32.0)
        out = np.asarray(enh.enhance_batch(noisy[None]))[0]

        def snr(est):
            seg = slice(1600, -1600)
            a = np.dot(est[seg], clean[seg]) / np.dot(clean[seg],
                                                      clean[seg])
            err = est[seg] - a * clean[seg]
            return 10 * np.log10((a * clean[seg] ** 2).sum()
                                 / (err ** 2).sum())

        assert snr(out) > snr(noisy) + 5  # >=5 dB improvement

    def test_file_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from tsasr_tpu.data.audio import write_wav
        from tsasr_tpu.inference.enhancement import \
            SpectralMaskEnhancement

        wav = np.random.default_rng(3).normal(
            size=8000).astype(np.float32) * 0.1
        src = str(tmp_path / "noisy.wav")
        dst = str(tmp_path / "clean.wav")
        write_wav(src, wav, 16000)
        enh = SpectralMaskEnhancement(
            lambda p, m: jnp.ones_like(m), {}, n_fft=512,
            win_length=32.0)
        out = enh.enhance_file(src, dst)
        assert out.shape[0] == 8000
        import os
        assert os.path.exists(dst)
