"""UNet family for denoising diffusion (full / encoder / decoder).

TPU-native equivalent of the reference UNet surface
(``vendor/speechbrain/speechbrain/nnet/unet.py``):

- ``timestep_embedding``        (:97)
- ``Upsample`` / ``Downsample`` (:269, :327)
- ``ResBlock``                  (:387)  GroupNorm-SiLU-conv + time-emb shift
- ``AttentionBlock``            (:532)  spatial self-attention
- ``UNetModel``                 (:695)  down / middle / up with skips
- ``EncoderUNetModel``          (:1011) down half -> latent map
- ``DecoderUNetModel``          (:1366) latent map -> up half
- ``DownsamplingPadding``       (:1623)
- ``UNetNormalizingAutoencoder``(:1682) encoder/decoder pair wrapped in
  the normalizing autoencoder (for latent diffusion)

TPU-first deviations:
- channels-LAST layout everywhere ((B, …spatial…, C)); the reference is
  NCHW. XLA's TPU convolutions are natively NHWC, and channels-last
  keeps the feature axis on the 128-lane dimension.
- ``dims`` in {1, 2} selects 1-D or 2-D spatial rank (3-D omitted: no
  volumetric models anywhere in the reference recipes).
- attention flattens spatial positions and runs one batched MXU matmul
  per head group rather than the reference's per-head conv_nd qkv.
- the final output conv is zero-initialised (the effect of the
  reference's fixup init: identity residual contribution at step 0).
"""

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal diffusion-timestep embedding (``unet.py:97-127``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], -1)
    return emb


def _group_norm(channels, norm_num_groups):
    return nn.GroupNorm(num_groups=min(norm_num_groups, channels))


class Upsample(nn.Module):
    """Nearest ×2 upsampling + optional conv (``unet.py:269-325``)."""

    channels: int
    use_conv: bool = True
    dims: int = 2

    @nn.compact
    def __call__(self, x):
        for ax in range(1, 1 + self.dims):
            x = jnp.repeat(x, 2, axis=ax)
        if self.use_conv:
            x = nn.Conv(self.channels, (3,) * self.dims, padding="SAME")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsampling (``unet.py:327-385``)."""

    channels: int
    use_conv: bool = True
    dims: int = 2

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.channels, (3,) * self.dims,
                           strides=(2,) * self.dims, padding="SAME")(x)
        return nn.avg_pool(x, (2,) * self.dims, strides=(2,) * self.dims)


class ResBlock(nn.Module):
    """Residual block with timestep-embedding shift (``unet.py:387-530``).
    Optionally performs the up/downsample itself (resblock_updown)."""

    out_channels: int
    dropout: float = 0.0
    dims: int = 2
    norm_num_groups: int = 32
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = nn.silu(_group_norm(x.shape[-1], self.norm_num_groups)(x))
        if self.up:
            up = Upsample(x.shape[-1], use_conv=False, dims=self.dims)
            h, x = up(h), up(x)
        elif self.down:
            down = Downsample(x.shape[-1], use_conv=False, dims=self.dims)
            h, x = down(h), down(x)
        h = nn.Conv(self.out_channels, (3,) * self.dims, padding="SAME")(h)
        shift = nn.Dense(self.out_channels)(nn.silu(emb))
        h = h + shift.reshape(shift.shape[:1] + (1,) * self.dims
                              + shift.shape[1:])
        h = nn.silu(_group_norm(self.out_channels,
                                self.norm_num_groups)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3,) * self.dims, padding="SAME",
                    kernel_init=nn.initializers.zeros)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,) * self.dims)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened positions
    (``unet.py:532-659``)."""

    num_heads: int = 1
    num_head_channels: int = -1
    norm_num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, *spatial, c = x.shape
        heads = (c // self.num_head_channels
                 if self.num_head_channels > 0 else self.num_heads)
        h = _group_norm(c, self.norm_num_groups)(x).reshape(b, -1, c)
        qkv = nn.Dense(3 * c, name="qkv")(h)
        q, k, v = [t.reshape(b, -1, heads, c // heads)
                   for t in jnp.split(qkv, 3, axis=-1)]
        scale = 1.0 / math.sqrt(c // heads)
        att = jax.nn.softmax(
            jnp.einsum("bthd,bshd->bhts", q * scale, k), -1)
        out = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, -1, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(x.shape)


class _CondEmbed(nn.Module):
    """Timestep + optional conditional embeddings -> one emb vector
    (``unet.py:661-693`` build_emb_proj)."""

    model_channels: int
    emb_dim: int
    cond_emb: Optional[Dict[str, Dict[str, int]]] = None
    use_cond_emb: Optional[Dict[str, bool]] = None

    @nn.compact
    def __call__(self, timesteps, cond):
        emb = nn.Sequential([
            nn.Dense(self.emb_dim), nn.silu, nn.Dense(self.emb_dim)])(
            timestep_embedding(timesteps, self.model_channels))
        if self.cond_emb:
            for key, spec in sorted(self.cond_emb.items()):
                if self.use_cond_emb and not self.use_cond_emb.get(key,
                                                                   True):
                    continue
                if cond is None or key not in cond:
                    raise ValueError(f"missing conditional input {key!r}")
                emb = emb + nn.Dense(self.emb_dim,
                                     name=f"cond_{key}")(cond[key])
        return emb


class UNetModel(nn.Module):
    """Full UNet with attention + timestep embedding
    (``unet.py:695-1009``). Input (B, …spatial…, in_channels); spatial
    dims must be divisible by ``2**(len(channel_mult)-1)``."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    emb_dim: Optional[int] = None
    cond_emb: Optional[Dict[str, Dict[str, int]]] = None
    use_cond_emb: Optional[Dict[str, bool]] = None
    num_heads: int = 1
    num_head_channels: int = -1
    norm_num_groups: int = 32
    resblock_updown: bool = False

    @nn.compact
    def __call__(self, x, timesteps, cond=None, deterministic=True):
        emb_dim = self.emb_dim or self.model_channels * 4
        emb = _CondEmbed(self.model_channels, emb_dim, self.cond_emb,
                         self.use_cond_emb)(timesteps, cond)

        def attn(h):
            return AttentionBlock(self.num_heads, self.num_head_channels,
                                  self.norm_num_groups)(h)

        h = nn.Conv(self.model_channels, (3,) * self.dims,
                    padding="SAME")(x)
        hs, ds = [h], 1
        for level, mult in enumerate(self.channel_mult):
            ch = mult * self.model_channels
            for _ in range(self.num_res_blocks):
                h = ResBlock(ch, self.dropout, self.dims,
                             self.norm_num_groups)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(ch, self.dropout, self.dims,
                                 self.norm_num_groups, down=True)(
                        h, emb, deterministic)
                else:
                    h = Downsample(ch, self.conv_resample, self.dims)(h)
                ds *= 2
                hs.append(h)

        mid_ch = self.channel_mult[-1] * self.model_channels
        h = ResBlock(mid_ch, self.dropout, self.dims,
                     self.norm_num_groups)(h, emb, deterministic)
        h = attn(h)
        h = ResBlock(mid_ch, self.dropout, self.dims,
                     self.norm_num_groups)(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = mult * self.model_channels
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], -1)
                h = ResBlock(ch, self.dropout, self.dims,
                             self.norm_num_groups)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = ResBlock(ch, self.dropout, self.dims,
                                     self.norm_num_groups, up=True)(
                            h, emb, deterministic)
                    else:
                        h = Upsample(ch, self.conv_resample, self.dims)(h)
                    ds //= 2

        h = nn.silu(_group_norm(h.shape[-1], self.norm_num_groups)(h))
        return nn.Conv(self.out_channels, (3,) * self.dims,
                       padding="SAME",
                       kernel_init=nn.initializers.zeros)(h)


class EncoderUNetModel(nn.Module):
    """Down half of the UNet -> spatial latent map
    (``unet.py:1011-1315``)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_heads: int = 1
    num_head_channels: int = -1
    norm_num_groups: int = 32
    resblock_updown: bool = False
    out_kernel_size: int = 3

    @nn.compact
    def __call__(self, x, timesteps=None, deterministic=True):
        if timesteps is None:
            timesteps = jnp.zeros((x.shape[0],), jnp.int32)
        emb_dim = self.model_channels * 4
        emb = _CondEmbed(self.model_channels, emb_dim)(timesteps, None)
        h = nn.Conv(self.model_channels, (3,) * self.dims,
                    padding="SAME")(x)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            ch = mult * self.model_channels
            for _ in range(self.num_res_blocks):
                h = ResBlock(ch, self.dropout, self.dims,
                             self.norm_num_groups)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads,
                                       self.num_head_channels,
                                       self.norm_num_groups)(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(ch, self.dropout, self.dims,
                                 self.norm_num_groups, down=True)(
                        h, emb, deterministic)
                else:
                    h = Downsample(ch, self.conv_resample, self.dims)(h)
                ds *= 2
        h = nn.silu(_group_norm(h.shape[-1], self.norm_num_groups)(h))
        return nn.Conv(self.out_channels,
                       (self.out_kernel_size,) * self.dims,
                       padding="SAME")(h)


class DecoderUNetModel(nn.Module):
    """Up half of the UNet: latent map -> sample
    (``unet.py:1366-1621``)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_heads: int = 1
    num_head_channels: int = -1
    norm_num_groups: int = 32
    resblock_updown: bool = False
    out_kernel_size: int = 3

    @nn.compact
    def __call__(self, x, timesteps=None, deterministic=True):
        if timesteps is None:
            timesteps = jnp.zeros((x.shape[0],), jnp.int32)
        emb_dim = self.model_channels * 4
        emb = _CondEmbed(self.model_channels, emb_dim)(timesteps, None)
        mults = list(self.channel_mult)
        h = nn.Conv(mults[-1] * self.model_channels, (3,) * self.dims,
                    padding="SAME")(x)
        ds = 2 ** (len(mults) - 1)
        for level, mult in reversed(list(enumerate(mults))):
            ch = mult * self.model_channels
            for _ in range(self.num_res_blocks):
                h = ResBlock(ch, self.dropout, self.dims,
                             self.norm_num_groups)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads,
                                       self.num_head_channels,
                                       self.norm_num_groups)(h)
            if level:
                if self.resblock_updown:
                    h = ResBlock(ch, self.dropout, self.dims,
                                 self.norm_num_groups, up=True)(
                        h, emb, deterministic)
                else:
                    h = Upsample(ch, self.conv_resample, self.dims)(h)
                ds //= 2
        h = nn.silu(_group_norm(h.shape[-1], self.norm_num_groups)(h))
        return nn.Conv(self.out_channels,
                       (self.out_kernel_size,) * self.dims,
                       padding="SAME",
                       kernel_init=nn.initializers.zeros)(h)


def downsampling_padding(x, factor, len_dims=(1,), rel_lengths=None):
    """Pad spatial dims to a multiple of ``factor``
    (``unet.py:1623-1680`` DownsamplingPadding). Returns (padded,
    adjusted relative lengths)."""
    pads = [(0, 0)] * x.ndim
    for d in len_dims:
        rem = (-x.shape[d]) % factor
        pads[d] = (0, rem)
    x_p = jnp.pad(x, pads)
    if rel_lengths is not None:
        d0 = len_dims[0]
        rel_lengths = rel_lengths * (x.shape[d0] / x_p.shape[d0])
    return x_p, rel_lengths


class UNetNormalizingAutoencoder(nn.Module):
    """Encoder/decoder UNet pair with a normalised latent space, for
    latent diffusion (``unet.py:1682-1827``). Channels-last:
    (B, H, W, in_channels) -> latent (B, H/2^k, W/2^k, latent_channels).
    """

    in_channels: int
    model_channels: int
    encoder_out_channels: int
    latent_channels: int
    encoder_num_res_blocks: int = 1
    encoder_attention_resolutions: Sequence[int] = ()
    decoder_num_res_blocks: int = 1
    decoder_attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    dims: int = 2
    num_heads: int = 1
    norm_num_groups: int = 32
    out_kernel_size: int = 3

    def setup(self):
        self.encoder_unet = EncoderUNetModel(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.encoder_out_channels,
            num_res_blocks=self.encoder_num_res_blocks,
            attention_resolutions=self.encoder_attention_resolutions,
            dropout=self.dropout, channel_mult=self.channel_mult,
            dims=self.dims, num_heads=self.num_heads,
            norm_num_groups=self.norm_num_groups,
            out_kernel_size=self.out_kernel_size)
        self.latent_proj = nn.Conv(self.latent_channels,
                                   (1,) * self.dims)
        self.decoder_unet = DecoderUNetModel(
            in_channels=self.latent_channels,
            model_channels=self.model_channels,
            out_channels=self.in_channels,
            num_res_blocks=self.decoder_num_res_blocks,
            attention_resolutions=self.decoder_attention_resolutions,
            dropout=self.dropout, channel_mult=self.channel_mult,
            dims=self.dims, num_heads=self.num_heads,
            norm_num_groups=self.norm_num_groups,
            out_kernel_size=self.out_kernel_size)

    def encode(self, x, deterministic=True):
        latent = self.latent_proj(
            self.encoder_unet(x, deterministic=deterministic))
        # normalised latent space (per-example standardisation)
        mean = latent.mean(axis=tuple(range(1, latent.ndim)),
                           keepdims=True)
        std = latent.std(axis=tuple(range(1, latent.ndim)),
                         keepdims=True)
        return (latent - mean) / (std + 1e-8)

    def decode(self, latent, deterministic=True):
        return self.decoder_unet(latent, deterministic=deterministic)

    def train_sample(self, x, deterministic=True):
        latent = self.encode(x, deterministic)
        rec = self.decode(latent, deterministic)
        return rec, latent

    def __call__(self, x, deterministic=True):
        return self.encode(x, deterministic)
