"""Input normalization with sentence / batch / speaker / global modes.

Full equivalent of the reference ``InputNormalization``
(``vendor/speechbrain/speechbrain/processing/features.py:933-1152``):

- ``sentence``: per-utterance masked mean/std (stateless — the recipe
  default; also exported as ``tsasr_tpu.ops.input_normalization``);
- ``batch``: mean of per-utterance stats applied batch-wide;
- ``global``: running average of batch stats, frozen after
  ``update_until_epoch`` (the reference's moving-average semantics);
- ``speaker``: running stats per speaker id.

TPU design: statistics are computed *inside* the jitted step (masked
reductions); the running state lives on the host as plain numpy (it
changes once per step, is tiny, and checkpoints like the reference's
state dict). The jitted step returns the batch stats, the host folds
them into the running state, and passes the current normalizer constants
into the next step — no data-dependent control flow inside jit.
"""

import os

import numpy as np

import jax.numpy as jnp

from tsasr_tpu.ops.features import input_normalization  # noqa: F401
from tsasr_tpu.ops.masks import length_to_mask, relative_to_absolute_lengths


def batch_stats(x, rel_lengths, eps=1e-10):
    """Per-utterance masked mean/std averaged over the batch -> (F,), (F,).

    Matches the reference's current_mean/current_std aggregation
    (``features.py:1072-1076``): mean over batch of per-utterance stats.
    """
    T = x.shape[1]
    counts = relative_to_absolute_lengths(rel_lengths, T)
    mask = length_to_mask(counts, T)[..., None]
    n = jnp.maximum(counts, 1).astype(x.dtype)[:, None, None]
    mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True) / n
    sq = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=1,
                 keepdims=True)
    std = jnp.sqrt(sq / jnp.maximum(n - 1.0, 1.0))
    std = jnp.maximum(std, eps)
    return mean[:, 0].mean(axis=0), std[:, 0].mean(axis=0)


class InputNormalization:
    """Stateful normalizer covering all four reference modes."""

    def __init__(self, mean_norm=True, std_norm=True, norm_type="global",
                 avg_factor=None, update_until_epoch=3, eps=1e-10):
        if norm_type not in ("sentence", "batch", "speaker", "global"):
            raise ValueError(f"norm_type={norm_type}")
        self.mean_norm = mean_norm
        self.std_norm = std_norm
        self.norm_type = norm_type
        self.avg_factor = avg_factor
        self.update_until_epoch = update_until_epoch
        self.eps = eps
        self.glob_mean = np.zeros(1, np.float32)
        self.glob_std = np.ones(1, np.float32)
        self.count = 0
        self.spk_dict_mean = {}
        self.spk_dict_std = {}
        self.spk_dict_count = {}

    # ------------------------------------------------------------ apply
    def __call__(self, x, rel_lengths, spk_ids=None, epoch=0,
                 training=True):
        if self.norm_type == "sentence":
            return input_normalization(x, rel_lengths,
                                       mean_norm=self.mean_norm,
                                       std_norm=self.std_norm,
                                       eps=self.eps)
        mean, std = batch_stats(x, rel_lengths, self.eps)
        if not self.mean_norm:
            mean = jnp.zeros_like(mean)
        if not self.std_norm:
            std = jnp.ones_like(std)
        if self.norm_type == "batch":
            return (x - mean) / std
        if self.norm_type == "global":
            mean_np = np.asarray(mean)
            std_np = np.asarray(std)
            if training:
                self._update_global(mean_np, std_np, epoch)
            return ((x - jnp.asarray(self.glob_mean))
                    / jnp.asarray(self.glob_std))
        # speaker mode: host loop over the (small) batch
        out = []
        for i in range(x.shape[0]):
            spk = int(np.asarray(spk_ids[i]).reshape(-1)[0])
            m_i, s_i = self._update_speaker(
                spk, np.asarray(mean), np.asarray(std), training)
            out.append((x[i] - jnp.asarray(m_i)) / jnp.asarray(s_i))
        return jnp.stack(out)

    def _update_global(self, mean, std, epoch):
        if self.count == 0:
            self.glob_mean, self.glob_std = mean, std
        elif epoch < self.update_until_epoch:
            w = (1.0 / (self.count + 1) if self.avg_factor is None
                 else self.avg_factor)
            self.glob_mean = (1 - w) * self.glob_mean + w * mean
            self.glob_std = (1 - w) * self.glob_std + w * std
        self.count += 1

    def _update_speaker(self, spk, mean, std, training):
        if training:
            if spk not in self.spk_dict_mean:
                self.spk_dict_mean[spk] = mean
                self.spk_dict_std[spk] = std
                self.spk_dict_count[spk] = 1
            else:
                self.spk_dict_count[spk] += 1
                w = (1.0 / self.spk_dict_count[spk]
                     if self.avg_factor is None else self.avg_factor)
                self.spk_dict_mean[spk] = \
                    (1 - w) * self.spk_dict_mean[spk] + w * mean
                self.spk_dict_std[spk] = \
                    (1 - w) * self.spk_dict_std[spk] + w * std
        if spk in self.spk_dict_mean:
            return self.spk_dict_mean[spk], self.spk_dict_std[spk]
        return mean, std

    # ------------------------------------------------------- checkpoint
    def save(self, path):
        np.savez(path,
                 glob_mean=self.glob_mean, glob_std=self.glob_std,
                 count=self.count,
                 spk_ids=np.asarray(list(self.spk_dict_mean.keys())),
                 spk_means=np.asarray(list(self.spk_dict_mean.values()))
                 if self.spk_dict_mean else np.zeros((0, 1)),
                 spk_stds=np.asarray(list(self.spk_dict_std.values()))
                 if self.spk_dict_std else np.zeros((0, 1)),
                 spk_counts=np.asarray(list(
                     self.spk_dict_count.values())))

    def load(self, path, end_of_epoch=True):
        path = str(path)
        # np.savez may have appended .npz to the checkpoint file name
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        data = np.load(path, allow_pickle=False)
        self.glob_mean = data["glob_mean"]
        self.glob_std = data["glob_std"]
        self.count = int(data["count"])
        self.spk_dict_mean = dict(zip(data["spk_ids"].tolist(),
                                      data["spk_means"]))
        self.spk_dict_std = dict(zip(data["spk_ids"].tolist(),
                                     data["spk_stds"]))
        self.spk_dict_count = dict(zip(data["spk_ids"].tolist(),
                                       data["spk_counts"].tolist()))
