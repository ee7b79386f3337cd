"""Learning-rate schedulers.

Equivalents of the reference scheduler suite
(``vendor/speechbrain/speechbrain/nnet/schedulers.py``):
- ``NoamScheduler`` (:363-440): lr(n) = lr_initial * normalize *
  min(n^-0.5, n * warmup^-1.5), normalize = warmup^0.5 (or
  model_size^-0.5); stepped once per optimizer step, checkpointable.
- ``noam_schedule``: the same curve as a pure optax-compatible
  schedule fn so the whole optimizer update stays inside jit.
- ``NewBobScheduler`` (:130): metric-driven annealing with improvement
  threshold + patience.
- ``LinearScheduler`` / ``StepScheduler``: value interpolation per epoch.
"""

import json
import math


def noam_schedule(lr_initial, n_warmup_steps, model_size=None):
    """Pure schedule fn (step -> lr) for use inside an optax chain."""
    if not isinstance(lr_initial, (int, float)):
        # common footgun: YAML parses `--lr 2e-3` as the STRING "2e-3"
        # (scientific notation needs a dot: 2.0e-3)
        raise TypeError(
            f"lr_initial must be a number, got {lr_initial!r} "
            f"({type(lr_initial).__name__}). If this came from a CLI "
            f"override, YAML needs a dot in scientific notation: "
            f"use 2.0e-3 or 0.002, not 2e-3.")
    normalize = n_warmup_steps ** 0.5 if model_size is None \
        else model_size ** -0.5

    def schedule(step):
        import jax.numpy as jnp
        n = jnp.maximum(step, 1).astype(jnp.float32)
        return lr_initial * normalize * jnp.minimum(
            n ** -0.5, n * n_warmup_steps ** -1.5)

    return schedule


class NoamScheduler:
    """Stateful host-side mirror (for logging + checkpoint parity)."""

    def __init__(self, lr_initial, n_warmup_steps, model_size=None):
        self.lr_initial = lr_initial
        self.n_warmup_steps = n_warmup_steps
        self.model_size = model_size
        self.current_lr = lr_initial
        self.n_steps = 0
        self.normalize = n_warmup_steps ** 0.5
        if model_size is not None:
            self.normalize = model_size ** (-0.5)

    def __call__(self, *_args):
        """Advance one optimizer step; returns (old_lr, new_lr)."""
        self.n_steps += 1
        current = self.current_lr
        lr = self.lr_initial * self._scale(self.n_steps)
        self.current_lr = lr
        return current, lr

    def _scale(self, n):
        return self.normalize * min(n ** -0.5,
                                    n * self.n_warmup_steps ** -1.5)

    def as_schedule_fn(self):
        return noam_schedule(self.lr_initial, self.n_warmup_steps,
                             self.model_size)

    def save(self, path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"n_steps": self.n_steps,
                       "current_lr": self.current_lr}, f)

    def load(self, path, end_of_epoch=True):
        with open(path, encoding="utf-8") as f:
            saved = json.load(f)
        self.n_steps = saved["n_steps"]
        self.current_lr = saved["current_lr"]


class NewBobScheduler:
    """Anneal lr by ``annealing_factor`` when the metric stops improving
    by ``improvement_threshold``; optional patience."""

    def __init__(self, initial_value, annealing_factor=0.5,
                 improvement_threshold=0.0025, patient=0):
        self.hyperparam_value = initial_value
        self.annealing_factor = annealing_factor
        self.improvement_threshold = improvement_threshold
        self.patient = patient
        self.metric_values = []
        self.current_patient = patient

    def __call__(self, metric_value):
        """Returns (old_value, new_value)."""
        old_value = new_value = self.hyperparam_value
        if self.metric_values:
            prev = self.metric_values[-1]
            if prev == 0:
                improvement = 0.0
            else:
                improvement = (prev - metric_value) / prev
            if improvement < self.improvement_threshold:
                if self.current_patient == 0:
                    new_value = old_value * self.annealing_factor
                    self.current_patient = self.patient
                else:
                    self.current_patient -= 1
        self.metric_values.append(metric_value)
        self.hyperparam_value = new_value
        return old_value, new_value

    def save(self, path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"value": self.hyperparam_value,
                       "metrics": self.metric_values,
                       "patient": self.current_patient}, f)

    def load(self, path, end_of_epoch=True):
        with open(path, encoding="utf-8") as f:
            saved = json.load(f)
        self.hyperparam_value = saved["value"]
        self.metric_values = saved["metrics"]
        self.current_patient = saved["patient"]


class LinearScheduler:
    """Linear interpolation between values over epochs."""

    def __init__(self, initial_value, final_value, epoch_count):
        self.initial_value = initial_value
        self.final_value = final_value
        self.epoch_count = epoch_count

    def __call__(self, epoch):
        frac = min(max(epoch - 1, 0) / max(self.epoch_count - 1, 1), 1.0)
        return self.initial_value + frac * (self.final_value
                                            - self.initial_value)


class StepScheduler:
    """lr * decay^floor(epoch / decay_epochs)."""

    def __init__(self, initial_value, decay_factor=0.5, decay_drop=2):
        self.initial_value = initial_value
        self.decay_factor = decay_factor
        self.decay_drop = decay_drop

    def __call__(self, epoch):
        return self.initial_value * math.pow(
            self.decay_factor, math.floor(epoch / self.decay_drop))


class CyclicCosineScheduler:
    """Cosine annealing with warm restarts + optional warmup
    (reference ``CyclicCosineScheduler``)."""

    def __init__(self, n_warmup_steps, lr_initial=None, total_steps=100000):
        self.n_warmup_steps = n_warmup_steps
        self.lr_initial = lr_initial
        self.total_steps = total_steps
        self.n_steps = 0
        self.current_lr = lr_initial

    def __call__(self, base_lr=None):
        self.n_steps += 1
        lr0 = self.lr_initial if self.lr_initial is not None else base_lr
        n = self.n_steps
        scale = 0.5 * (1 + math.cos(
            math.pi * (n + self.n_warmup_steps)
            / (self.total_steps + self.n_warmup_steps)))
        old = self.current_lr
        self.current_lr = lr0 * scale
        return old, self.current_lr

    def save(self, path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"n_steps": self.n_steps,
                       "current_lr": self.current_lr}, f)

    def load(self, path, end_of_epoch=True):
        with open(path, encoding="utf-8") as f:
            saved = json.load(f)
        self.n_steps = saved["n_steps"]
        self.current_lr = saved["current_lr"]
