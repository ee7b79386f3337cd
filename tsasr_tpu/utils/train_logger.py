"""Training loggers: per-epoch stats lines, TensorBoard, W&B.

Equivalent of the reference logger suite
(``vendor/speechbrain/speechbrain/utils/train_logger.py``):
- ``FileTrainLogger`` (:47-105): one line per epoch,
  ``"epoch: N, lr: 1.00e-3 - train loss: y - valid loss: z, valid WER: w"``
  with floats in (1, 100) at fixed precision and scientific notation
  otherwise — the format that ``tools/plot_train_log`` parses.
- ``TensorboardLogger`` (:106) via tensorboardX (gated).
- ``WandBLogger`` (:184) gated on the wandb package.
- ``ProgressSampleLogger`` (:244): saves periodic sample artifacts.
"""

import logging
import os

logger = logging.getLogger(__name__)


class TrainLogger:
    def log_stats(self, stats_meta, train_stats=None, valid_stats=None,
                  test_stats=None, verbose=False):
        raise NotImplementedError


class FileTrainLogger(TrainLogger):
    """One summary line per epoch appended to ``save_file``."""

    def __init__(self, save_file, precision=2):
        self.save_file = save_file
        self.precision = precision

    def _format_value(self, value):
        if isinstance(value, float) and 1.0 < value < 100.0:
            return f"{value:.{self.precision}f}"
        if isinstance(value, float):
            return f"{value:.{self.precision}e}"
        return str(value)

    def _stats_to_string(self, stats, dataset=None):
        parts = []
        for key, value in stats.items():
            name = f"{dataset} {key}" if dataset else key
            parts.append(f"{name}: {self._format_value(value)}")
        return ", ".join(parts)

    def log_stats(self, stats_meta, train_stats=None, valid_stats=None,
                  test_stats=None, verbose=True):
        # multi-process: stats are merged upstream (loss allgather-mean,
        # WER/CER dedup) so every process holds the same line — only the
        # main process appends it (reference train loggers run under
        # run_on_main, core.py:1241)
        from tsasr_tpu.parallel.distributed import if_main_process
        if not if_main_process():
            return
        summary = self._stats_to_string(stats_meta)
        for dataset, stats in [("train", train_stats),
                               ("valid", valid_stats),
                               ("test", test_stats)]:
            if stats is not None:
                summary += " - " + self._stats_to_string(stats, dataset)
        os.makedirs(os.path.dirname(self.save_file) or ".", exist_ok=True)
        with open(self.save_file, "a") as f:
            print(summary, file=f)
        if verbose:
            logger.info(summary)


class TensorboardLogger(TrainLogger):
    """TensorBoard scalars via tensorboardX."""

    def __init__(self, save_dir):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(save_dir)
        self.global_step = {"train": {}, "valid": {}, "test": {},
                            "meta": 0}

    def log_stats(self, stats_meta, train_stats=None, valid_stats=None,
                  test_stats=None, verbose=False):
        self.global_step["meta"] += 1
        step = self.global_step["meta"]
        for key, value in stats_meta.items():
            if isinstance(value, (int, float)):
                self.writer.add_scalar(f"meta/{key}", value, step)
        for dataset, stats in [("train", train_stats),
                               ("valid", valid_stats),
                               ("test", test_stats)]:
            if stats is None:
                continue
            for key, value in stats.items():
                if isinstance(value, (int, float)):
                    self.writer.add_scalar(f"{dataset}/{key}", value, step)


class WandBLogger(TrainLogger):
    """Weights & Biases logging (gated on the wandb package)."""

    def __init__(self, initializer=None, **init_kwargs):
        try:
            import wandb
        except ImportError as e:
            raise ImportError(
                "WandBLogger requires the wandb package (not bundled); "
                "use FileTrainLogger or TensorboardLogger") from e
        self.run = (initializer or wandb.init)(**init_kwargs)

    def log_stats(self, stats_meta, train_stats=None, valid_stats=None,
                  test_stats=None, verbose=False):
        logs = {}
        for dataset, stats in [("train", train_stats),
                               ("valid", valid_stats),
                               ("test", test_stats)]:
            if stats is not None:
                logs[dataset] = stats
        step = stats_meta.get("epoch")
        self.run.log({**logs, **stats_meta}, step=step)


class ProgressSampleLogger:
    """Periodically saves sample artifacts (arrays as .npy, text as .txt)
    into ``<output_path>/samples/<epoch>/``."""

    def __init__(self, output_path, batch_sample_size=1):
        self.output_path = output_path
        self.batch_sample_size = batch_sample_size
        self.progress_samples = {}

    def remember(self, **kwargs):
        self.progress_samples.update(kwargs)

    def reset(self):
        self.progress_samples = {}

    def save(self, epoch):
        import numpy as np
        target = os.path.join(self.output_path, "samples", str(epoch))
        os.makedirs(target, exist_ok=True)
        for key, value in self.progress_samples.items():
            if isinstance(value, str):
                with open(os.path.join(target, f"{key}.txt"), "w") as f:
                    f.write(value)
            else:
                np.save(os.path.join(target, f"{key}.npy"),
                        np.asarray(value))
        self.reset()
