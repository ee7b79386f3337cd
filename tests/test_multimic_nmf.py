"""Multi-mic beamforming/localization, NMF separation, and the public
signal-processing ops.

Value tests on simulated geometry: GCC-PHAT recovers known sample
delays, delay-and-sum / MVDR / GEV raise SNR against directional noise,
SRP-PHAT finds the source direction, NMF separates two spectrally
disjoint sources.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tsasr_tpu.processing.multi_mic import (
    covariance,
    delay_sum,
    gcc_phat,
    gev,
    mvdr,
    music,
    sphere_grid,
    srp_phat,
    steering_vector,
)

SR = 16000
N_FFT = 256


def stft_multi(wavs_mc):
    """(M, L) -> (1, T, F, M) complex STFT."""
    M, L = wavs_mc.shape
    hop, win = 128, N_FFT
    frames = (L - win) // hop + 1
    out = np.empty((1, frames, N_FFT // 2 + 1, M), np.complex64)
    window = np.hanning(win)
    for m in range(M):
        for t in range(frames):
            seg = wavs_mc[m, t * hop: t * hop + win] * window
            out[0, t, :, m] = np.fft.rfft(seg)
    return jnp.asarray(out)


def delayed_copies(sig, delays):
    """Make M channels of ``sig`` delayed by integer samples."""
    M = len(delays)
    L = len(sig)
    out = np.zeros((M, L), np.float32)
    for m, d in enumerate(delays):
        if d >= 0:
            out[m, d:] = sig[: L - d]
        else:
            out[m, :d] = sig[-d:]
    return out


class TestGccPhat:
    def test_recovers_integer_delays(self):
        rng = np.random.default_rng(0)
        sig = rng.normal(size=SR).astype(np.float32)
        delays = [0, 3, -2]
        Xs = stft_multi(delayed_copies(sig, delays))
        cov = covariance(Xs)
        tdoas = np.asarray(gcc_phat(cov, N_FFT))[0, 0]
        np.testing.assert_allclose(tdoas, delays, atol=0.3)


class TestBeamforming:
    def make_scene(self, rng, noise_scale=1.0):
        sig = np.sin(2 * np.pi * 440 / SR *
                     np.arange(SR)).astype(np.float32)
        noise = rng.normal(size=SR).astype(np.float32) * noise_scale
        target_delays = [0, 0, 0]            # broadside target
        noise_delays = [0, 5, 10]            # off-axis interferer
        mix = delayed_copies(sig, target_delays) + \
            delayed_copies(noise, noise_delays)
        return sig, noise, mix, target_delays, noise_delays

    def snr(self, est, ref):
        est = est - est.mean()
        ref = ref - ref.mean()
        a = np.dot(est, ref) / np.dot(ref, ref)
        err = est - a * ref
        return 10 * np.log10(np.dot((a * ref), (a * ref))
                             / (np.dot(err, err) + 1e-12))

    def test_delay_sum_aligns(self):
        """Delay-and-sum with the target's TDOAs beats a single mic."""
        rng = np.random.default_rng(1)
        sig, noise, mix, t_del, _ = self.make_scene(rng)
        Xs = stft_multi(mix)
        out = np.asarray(delay_sum(
            Xs, jnp.asarray([t_del], jnp.float32), N_FFT))[0]
        # compare magnitudes frame-wise against the single-channel mix
        single = np.asarray(stft_multi(mix[:1]))[0, :, :, 0]
        sig_only = np.asarray(stft_multi(
            delayed_copies(sig, [0])))[0, :, :, 0]
        # error vs clean target spectrum
        err_ds = np.abs(np.abs(out) - np.abs(sig_only)).mean()
        err_single = np.abs(np.abs(single) - np.abs(sig_only)).mean()
        assert err_ds < err_single

    def test_mvdr_suppresses_directional_noise(self):
        rng = np.random.default_rng(2)
        sig, noise, mix, t_del, n_del = self.make_scene(rng)
        Xs = stft_multi(mix)
        noise_only = stft_multi(delayed_copies(noise, n_del))
        nn_cov = covariance(noise_only)
        out = np.asarray(mvdr(Xs, nn_cov,
                              jnp.asarray(t_del, jnp.float32), N_FFT))[0]
        sig_only = np.asarray(stft_multi(
            delayed_copies(sig, [0])))[0, :, :, 0]
        single = np.asarray(Xs)[0, :, :, 0]
        err_mvdr = np.abs(np.abs(out) - np.abs(sig_only)).mean()
        err_single = np.abs(np.abs(single) - np.abs(sig_only)).mean()
        assert err_mvdr < 0.7 * err_single

    def test_gev_raises_snr(self):
        rng = np.random.default_rng(3)
        sig, noise, mix, t_del, n_del = self.make_scene(rng)
        Xs = stft_multi(mix)
        ss_cov = covariance(stft_multi(delayed_copies(sig, t_del)))
        nn_cov = covariance(stft_multi(delayed_copies(noise, n_del)))
        out = np.asarray(gev(Xs, ss_cov, nn_cov))[0]
        # energy at the target's 440 Hz bin relative to total must beat
        # the single-channel mixture's
        f_bin = int(round(440 / SR * N_FFT))
        single = np.asarray(Xs)[0, :, :, 0]

        def band_ratio(spec):
            p = np.abs(spec) ** 2
            return p[:, f_bin - 1: f_bin + 2].sum() / p.sum()

        assert band_ratio(out) > band_ratio(single)


class TestDOA:
    def test_srp_and_music_find_direction(self):
        rng = np.random.default_rng(4)
        sig = rng.normal(size=SR).astype(np.float32)
        # linear array along x, 5 cm spacing
        mics = jnp.asarray([[0.0, 0, 0], [0.05, 0, 0], [0.10, 0, 0]],
                           jnp.float32)
        # source from +x: wavefront hits mic 0 first -> delays grow
        # along the array: tau_m = (d . p_m)/c with d = (+1, 0, 0)
        c = 343.0
        delays = [int(round(0.05 * m / c * SR * -(-1)))
                  for m in range(3)]
        doa = np.asarray([1.0, 0, 0])
        delays = [int(round(-(doa @ np.asarray(p)) / c * SR))
                  for p in np.asarray(mics)]
        Xs = stft_multi(delayed_copies(sig, delays))
        cov = covariance(Xs)
        grid = sphere_grid(162)
        power, best = srp_phat(cov, mics, grid, SR, N_FFT)
        assert float(best[0][0]) > 0.8      # x-component ~ +1
        spec, best_m = music(cov, mics, grid, SR, N_FFT, n_sources=1)
        assert float(best_m[0][0]) > 0.8


class TestNMF:
    def test_separates_disjoint_spectra(self):
        from tsasr_tpu.processing.nmf import (
            nmf_separate_spectra,
            train_nmf_templates,
        )
        rng = np.random.default_rng(5)
        F, T = 33, 50
        # source 1 lives in low bins, source 2 in high bins
        s1 = np.zeros((F, T)); s1[3:8] = rng.random((5, T)) + 0.5
        s2 = np.zeros((F, T)); s2[20:25] = rng.random((5, T)) + 0.5
        W1, _ = train_nmf_templates(s1, K=4, n_iter=100)
        W2, _ = train_nmf_templates(s2, K=4, n_iter=100)
        Xmix = jnp.asarray((s1 + s2).T[None])          # (1, T, F)
        X1, X2 = nmf_separate_spectra([W1, W2], Xmix, n_iter=300)
        X1, X2 = np.asarray(X1)[0], np.asarray(X2)[0]
        # energy attribution: each estimate concentrates in its band
        assert X1[3:8].sum() > 5 * X1[20:25].sum()
        assert X2[20:25].sum() > 5 * X2[3:8].sum()
        # and the sum approximates the mixture
        np.testing.assert_allclose((X1 + X2).sum(), (s1 + s2).sum(),
                                   rtol=0.2)


class TestSignalProcessing:
    def test_amplitude_and_rescale(self):
        from tsasr_tpu.ops.signal_processing import (
            compute_amplitude,
            dB_to_amplitude,
            normalize,
            rescale,
        )
        x = jnp.asarray([[0.0, 1.0, -1.0, 0.0]])
        assert float(compute_amplitude(x)[0, 0]) == pytest.approx(0.5)
        assert float(compute_amplitude(x, amp_type="peak")[0, 0]) == 1.0
        assert float(dB_to_amplitude(20.0)) == pytest.approx(10.0)
        y = rescale(x, None, 2.0, amp_type="peak")
        assert float(jnp.max(jnp.abs(y))) == pytest.approx(2.0)
        n = normalize(x, amp_type="peak")
        assert float(jnp.max(jnp.abs(n))) == pytest.approx(1.0)

    def test_convolve_and_reverb(self):
        from tsasr_tpu.ops.signal_processing import (
            convolve1d,
            reverberate,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 64)), jnp.float32)
        delta = jnp.zeros((1, 9)).at[0, 0].set(1.0)
        out = convolve1d(x, delta)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-5)
        # RIR with its peak at index 3: reverberate re-aligns the direct
        # path, preserving amplitude
        rir = jnp.zeros((1, 16)).at[0, 3].set(1.0)
        rev = reverberate(x, rir)
        np.testing.assert_allclose(
            np.asarray(rev)[0, :32], np.asarray(x)[0, :32], atol=1e-4)

    def test_notch_filter_rejects_band(self):
        from tsasr_tpu.ops.signal_processing import (
            convolve1d,
            notch_filter,
        )
        t = np.arange(2048) / 2048
        low = np.sin(2 * np.pi * 64 * t)
        mid = np.sin(2 * np.pi * 512 * t)
        kernel = notch_filter(0.5, filter_width=101)  # reject ~0.5*nyq
        pad = 50

        def energy(sig):
            out = convolve1d(jnp.asarray(sig, jnp.float32)[None],
                             kernel, padding=(pad, pad))
            return float(jnp.sum(out ** 2))

        # 512/1024 = 0.5 of nyquist -> rejected; 64/1024 passes
        assert energy(mid) < 0.05 * energy(low)

    def test_overlap_and_add(self):
        from tsasr_tpu.ops.signal_processing import overlap_and_add
        frames = jnp.asarray([[[1.0, 1.0, 0.0], [0.0, 2.0, 2.0]]])
        out = overlap_and_add(frames, frame_step=2)
        np.testing.assert_allclose(np.asarray(out)[0],
                                   [1, 1, 0, 2, 2])
