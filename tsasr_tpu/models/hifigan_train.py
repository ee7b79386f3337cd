"""HiFi-GAN training machinery: discriminators + GAN/spectral losses.

Closes the documented gap in ``models/hifigan.py`` (generator-only):
flax ports of the reference discriminators and training losses
(``lobes/models/HifiGAN.py:472-1251``): multi-period + multi-scale
discriminators, STFT/L1-mel spectral losses, MSE adversarial losses,
feature matching, and the Generator/Discriminator loss aggregators.

Deviation (documented): the reference wraps conv weights in
weight_norm/spectral_norm parametrizations; here plain convs — the
parametrization is an optimizer-trajectory device, not an architecture
difference, and checkpoints port by folding the norm into the weights
(same convention as the generator port).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """Periodic discriminator: fold every ``period``-th sample into a
    2nd spatial dim, stack of (k, 1) convs (reference :472-577)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T) -> (score (B, S), feature list)."""
        B, T = x.shape
        pad = (-T) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, -1, self.period, 1)      # (B, T/p, p, 1)
        feats = []
        for ch in (32, 128, 512, 1024):
            x = nn.Conv(ch, (self.kernel_size, 1),
                        strides=(self.stride, 1), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype,
                    name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    """Periods (2, 3, 5, 7, 11) (reference :578-613)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.periods:
            s, f = DiscriminatorP(p, dtype=self.dtype,
                                  name=f"disc_p{p}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1-D conv stack (reference
    :614-663)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T) -> (score (B, S), feature list)."""
        B, T = x.shape
        h = x[..., None]                          # (B, T, 1)
        specs = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
                 (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
                 (1024, 5, 1, 1)]
        feats = []
        for ch, k, s, g in specs:
            h = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                        feature_group_count=g, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            feats.append(h)
        h = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype,
                    name="conv_post")(h)
        feats.append(h)
        return h.reshape(B, -1), feats


class MultiScaleDiscriminator(nn.Module):
    """Three scale discriminators on x, x/2, x/4 via average pooling
    (reference :664-700)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        h = x
        for i in range(3):
            if i > 0:
                h = nn.avg_pool(h[..., None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
            s, f = DiscriminatorS(dtype=self.dtype,
                                  name=f"disc_s{i}")(h)
            scores.append(s)
            feats.append(f)
        return scores, feats


class HifiganDiscriminator(nn.Module):
    """MPD + MSD wrapper (reference :701-739)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, f1 = MultiPeriodDiscriminator(dtype=self.dtype,
                                          name="mpd")(x)
        s2, f2 = MultiScaleDiscriminator(dtype=self.dtype,
                                         name="msd")(x)
        return s1 + s2, f1 + f2


# =============================================================== losses
def _stft_mag(x, n_fft, hop, win):
    window = jnp.hanning(win).astype(x.dtype)
    frames = 1 + (x.shape[-1] - win) // hop
    idx = (jnp.arange(frames)[:, None] * hop
           + jnp.arange(win)[None, :])
    seg = x[..., idx] * window                     # (B, T, win)
    spec = jnp.fft.rfft(seg, n_fft)
    return jnp.sqrt(jnp.clip(jnp.abs(spec) ** 2, 1e-8))


def stft_loss(y_hat, y, n_fft=1024, hop_length=256, win_length=1024):
    """-> (magnitude L1 on log-mags, spectral convergence) (reference
    ``STFTLoss``, :750-790)."""
    mh = _stft_mag(y_hat, n_fft, hop_length, win_length)
    m = _stft_mag(y, n_fft, hop_length, win_length)
    loss_mag = jnp.mean(jnp.abs(jnp.log(m) - jnp.log(mh)))
    loss_sc = jnp.linalg.norm(m - mh) / (jnp.linalg.norm(m) + 1e-8)
    return loss_mag, loss_sc


def multi_scale_stft_loss(y_hat, y,
                          n_ffts=(1024, 2048, 512),
                          hop_lengths=(120, 240, 50),
                          win_lengths=(600, 1200, 240)):
    """Averaged STFT loss over several resolutions (reference
    ``MultiScaleSTFTLoss``, :791-831)."""
    mag = sc = 0.0
    for n, h, w in zip(n_ffts, hop_lengths, win_lengths):
        m, s = stft_loss(y_hat, y, n, h, w)
        mag += m
        sc += s
    k = len(n_ffts)
    return mag / k, sc / k


def l1_spec_loss(y_hat, y, sample_rate=22050, n_fft=1024,
                 hop_length=256, win_length=1024, n_mels=80):
    """L1 on log-mel spectrograms (reference ``L1SpecLoss``,
    :832-944)."""
    from tsasr_tpu.ops.features import mel_filterbank_matrix
    mel_fb = mel_filterbank_matrix(n_mels=n_mels, n_fft=n_fft,
                                   sample_rate=sample_rate)
    mh = _stft_mag(y_hat, n_fft, hop_length, win_length) @ mel_fb
    m = _stft_mag(y, n_fft, hop_length, win_length) @ mel_fb
    return jnp.mean(jnp.abs(jnp.log(jnp.clip(m, 1e-5))
                            - jnp.log(jnp.clip(mh, 1e-5))))


def mse_g_loss(score_fake):
    """LSGAN generator loss for one score (reference ``MSEGLoss``)."""
    return jnp.mean((score_fake - 1.0) ** 2)


def mse_d_loss(score_fake, score_real):
    """LSGAN discriminator loss -> (total, real part, fake part)
    (reference ``MSEDLoss``)."""
    loss_real = jnp.mean((score_real - 1.0) ** 2)
    loss_fake = jnp.mean(score_fake ** 2)
    return loss_real + loss_fake, loss_real, loss_fake


def feature_match_loss(feats_fake, feats_real):
    """L1 between all discriminator feature maps (reference
    ``MelganFeatureLoss``, :966-1002)."""
    total = 0.0
    count = 0
    for ff, fr in zip(feats_fake, feats_real):
        for a, b in zip(ff, fr):
            total += jnp.mean(jnp.abs(a - b))
            count += 1
    return total / max(count, 1)


def generator_loss(y_hat=None, y=None, scores_fake=None,
                   feats_fake=None, feats_real=None,
                   stft_loss_weight=0.0, mseg_loss_weight=1.0,
                   feat_match_loss_weight=0.0, l1_spec_loss_weight=0.0,
                   use_stft_loss=False, use_l1_spec_loss=False,
                   sample_rate=22050):
    """Weighted generator loss dict (reference ``GeneratorLoss``,
    :1104-1211): G_loss = gen (spectral) + adv (LSGAN + feature
    matching)."""
    loss = {}
    gen_loss = 0.0
    adv_loss = 0.0
    if use_stft_loss:
        mag, sc = multi_scale_stft_loss(y_hat[:, : y.shape[-1]], y)
        loss["G_stft_loss_mg"] = mag
        loss["G_stft_loss_sc"] = sc
        gen_loss += stft_loss_weight * (mag + sc)
    if use_l1_spec_loss:
        l1 = l1_spec_loss(y_hat, y, sample_rate=sample_rate)
        loss["G_l1_spec_loss"] = l1
        gen_loss += l1_spec_loss_weight * l1
    if scores_fake is not None:
        adv = sum(mse_g_loss(s) for s in scores_fake) \
            / len(scores_fake)
        loss["G_mse_fake_loss"] = adv
        adv_loss += mseg_loss_weight * adv
    if feats_fake is not None and feat_match_loss_weight > 0:
        fm = feature_match_loss(feats_fake, feats_real)
        loss["G_feat_match_loss"] = fm
        adv_loss += feat_match_loss_weight * fm
    loss["G_gen_loss"] = gen_loss
    loss["G_adv_loss"] = adv_loss
    loss["G_loss"] = gen_loss + adv_loss
    return loss


def discriminator_loss(scores_fake, scores_real):
    """Summed LSGAN discriminator loss dict (reference
    ``DiscriminatorLoss`` + ``_apply_D_loss``, :1063-1251)."""
    total = real_total = fake_total = 0.0
    for sf, sr in zip(scores_fake, scores_real):
        t, r, f = mse_d_loss(sf, sr)
        total += t
        real_total += r
        fake_total += f
    n = len(scores_fake)
    return {"D_mse_gan_loss": total / n,
            "D_mse_gan_real_loss": real_total / n,
            "D_mse_gan_fake_loss": fake_total / n,
            "D_loss": total / n}
