"""Experiment CLI + directory management.

Equivalent of the reference's CLI layer (``core.py:55-410``):
- ``parse_arguments``: run-opt flags (device/debug/precision/ckpt
  intervals/grad accumulation/...) are parsed; every *unknown*
  ``--key value`` pair becomes a YAML override so anything in the hparams
  file is overridable from the command line (``core.py:396-410``);
- ``create_experiment_directory``: experiment dir with the resolved
  hyperparams file, a copy of the invoking script, ``log.txt`` wired to
  an excepthook for crash forensics, and ``env.log`` with the
  environment snapshot (``core.py:55-131``).
"""

import argparse
import logging
import os
import shutil
import sys

import yaml

from tsasr_tpu.parallel.distributed import if_main_process, run_on_main
from tsasr_tpu.utils.hparams import dump_resolved_yaml
from tsasr_tpu.utils.logger import (
    get_environment_description,
    setup_logging,
)

logger = logging.getLogger(__name__)

RUN_OPT_FLAGS = [
    ("--debug", {"action": "store_true", "default": None,
                 "help": "Tiny run: debug_batches/debug_epochs only"}),
    ("--debug_batches", {"type": int, "default": None}),
    ("--debug_epochs", {"type": int, "default": None}),
    ("--device", {"type": str, "default": None,
                  "help": "jax platform override (tpu/cpu)"}),
    ("--precision", {"type": str, "default": None,
                     "choices": ["fp32", "bf16"]}),
    ("--noprogressbar", {"action": "store_true", "default": None}),
    ("--grad_accumulation_factor", {"type": int, "default": None}),
    ("--optimizer_step_limit", {"type": int, "default": None}),
    ("--ckpt_interval_minutes", {"type": float, "default": None}),
    ("--ckpt_interval_steps", {"type": int, "default": None}),
    ("--max_grad_norm", {"type": float, "default": None}),
    ("--nonfinite_patience", {"type": int, "default": None}),
    ("--test_only", {"action": "store_true", "default": None}),
    ("--data_parallel_count", {"type": int, "default": None,
                               "help": "devices on the data axis"}),
    ("--tensor_parallel_count", {"type": int, "default": None,
                                 "help": "devices on the model axis"}),
    ("--sequence_parallel_count", {"type": int, "default": None,
                                   "help": "devices on the seq (time) "
                                   "axis — causal banded encoders"}),
    ("--pipeline_parallel_count", {"type": int, "default": None,
                                   "help": "devices on the pipe (layer) "
                                   "axis — GPipe microbatching"}),
    ("--profile", {"action": "store_true", "default": None,
                   "help": "capture a jax profiler trace of training"}),
    ("--profile_dir", {"type": str, "default": None}),
]


def parse_arguments(arg_list=None):
    """Returns (hparams_file, run_opts dict, overrides yaml string).

    Also the distributed entry hook: when launched by
    ``python -m tsasr_tpu.parallel.launch`` this joins the process group
    before any JAX device is touched (every entry point calls
    parse_arguments first), mirroring the reference's parse_arguments →
    ddp_init_group ordering (``core.py:372-394``)."""
    from tsasr_tpu.parallel.distributed import maybe_init_distributed
    maybe_init_distributed()
    if arg_list is None:
        arg_list = sys.argv[1:]
    parser = argparse.ArgumentParser(description="tsasr_tpu experiment")
    parser.add_argument("hparams_file", type=str,
                        help="HyperPyYAML hparams file")
    for flag, kwargs in RUN_OPT_FLAGS:
        parser.add_argument(flag, **kwargs)
    known, unknown = parser.parse_known_args(arg_list)
    run_opts = {k: v for k, v in vars(known).items()
                if k != "hparams_file" and v is not None}
    overrides = _unknown_to_overrides(unknown)
    return known.hparams_file, run_opts, overrides


def _unknown_to_overrides(unknown):
    """['--lr', '3e-4', '--augment=True'] -> YAML override string."""
    pairs = {}
    i = 0
    while i < len(unknown):
        arg = unknown[i]
        if not arg.startswith("--"):
            raise ValueError(f"Unexpected positional argument: {arg}")
        if "=" in arg:
            key, value = arg[2:].split("=", 1)
            i += 1
        else:
            key = arg[2:]
            if i + 1 >= len(unknown):
                raise ValueError(f"Override flag --{key} missing a value")
            value = unknown[i + 1]
            i += 2
        pairs[key] = yaml.safe_load(value)
    return yaml.safe_dump(pairs) if pairs else ""


def create_experiment_directory(experiment_directory,
                                hyperparams_to_save=None, overrides=None,
                                log_config=None, save_env_desc=True):
    """Create the experiment dir (main process), wire logging/excepthook."""

    def _create():
        os.makedirs(experiment_directory, exist_ok=True)
        if hyperparams_to_save is not None:
            dump_resolved_yaml(
                hyperparams_to_save, overrides,
                os.path.join(experiment_directory, "hyperparams.yaml"))
        script = os.path.realpath(sys.argv[0])
        if os.path.isfile(script):
            shutil.copy(script, experiment_directory)
        if save_env_desc:
            with open(os.path.join(experiment_directory, "env.log"),
                      "w") as f:
                f.write(get_environment_description())

    run_on_main(_create)
    if if_main_process():
        log_file = os.path.join(experiment_directory, "log.txt")
        setup_logging(log_file)
        sys.excepthook = _make_excepthook(log_file)
        logger.info("Beginning experiment!")
        logger.info("Experiment folder: %s", experiment_directory)
    else:
        # non-main workers log INFO to their own file (stderr stays
        # quiet) so multi-process runs are debuggable per process —
        # the reference names these log files by rank too
        import jax
        log_file = os.path.join(
            experiment_directory, f"log_proc{jax.process_index()}.txt")
        setup_logging(log_file)
        logger.info("Worker process %d ready", jax.process_index())
    _enable_compilation_cache()


def _enable_compilation_cache():
    """Persistent XLA compilation cache: dynamic bucketing compiles one
    program per batch shape, and on TPU each compile costs minutes over
    the tunnel — caching makes reruns/resumes start in seconds.
    Opt out with TSASR_NO_COMPILE_CACHE=1."""
    if os.environ.get("TSASR_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "tsasr_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:    # pragma: no cover - best effort
        logger.info("compilation cache unavailable: %s", e)


def _make_excepthook(log_file):
    def excepthook(exc_type, exc_value, exc_traceback):
        import traceback
        with open(log_file, "a") as f:
            f.write("\nException:\n")
            traceback.print_exception(exc_type, exc_value, exc_traceback,
                                      file=f)
        sys.__excepthook__(exc_type, exc_value, exc_traceback)

    return excepthook
