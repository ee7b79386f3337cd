"""Multi-host process coordination helpers.

Equivalents of the reference's ``utils/distributed.py`` surface
(``run_on_main``:15, ``if_main_process``:83, ``ddp_barrier``:114,
recipe-side ``all_gather_object``): in the JAX runtime, processes are
launched by ``jax.distributed.initialize`` and the program is SPMD, so
"main process" is ``jax.process_index() == 0`` and barriers ride the
device collectives.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)

_initialized = False


def maybe_init_distributed():
    """Join the process group announced by ``parallel.launch``.

    Reads ``TSASR_DIST_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}`` (set per
    worker by ``python -m tsasr_tpu.parallel.launch``) and calls
    ``jax.distributed.initialize`` BEFORE any device is used — the JAX
    equivalent of the reference's ``ddp_init_group``
    (``utils/distributed.py:123-201``). No-op without the env vars or if
    already initialized. Returns True when multi-process mode is active.

    On the CPU backend, cross-process collectives need an explicit
    implementation; gloo ships with jaxlib and is selected here.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("TSASR_DIST_COORDINATOR")
    if not coordinator:
        return False
    import jax
    num_processes = int(os.environ["TSASR_DIST_NUM_PROCESSES"])
    process_id = int(os.environ["TSASR_DIST_PROCESS_ID"])
    platforms = (os.environ.get("JAX_PLATFORMS")
                 or os.environ.get("JAX_PLATFORM_NAME") or "")
    if "cpu" in platforms.lower():
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def _safe_process_index():
    try:
        import jax
        return jax.process_index()
    except Exception:  # noqa: BLE001 — before backend init
        return 0


def _safe_process_count():
    try:
        import jax
        return jax.process_count()
    except Exception:  # noqa: BLE001
        return 1


def if_main_process():
    return _safe_process_index() == 0


def run_on_main(func, args=None, kwargs=None, post_func=None,
                post_args=None, post_kwargs=None):
    """Run func on process 0, barrier, then post_func on the others."""
    if if_main_process():
        func(*(args or ()), **(kwargs or {}))
    ddp_barrier()
    if not if_main_process() and post_func is not None:
        post_func(*(post_args or ()), **(post_kwargs or {}))


def ddp_barrier(name="tsasr_barrier"):
    """Cross-process sync point (no-op single-process)."""
    if _safe_process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_object(obj):
    """Gather an arbitrary picklable object from every process.

    Used for the eval-metric merge (the reference's
    ``torch.distributed.all_gather_object`` at
    ``train_librispeechmix_scratch.py:217-236``). Objects are
    JSON-serialized and exchanged through a device all-gather of bytes.
    """
    if _safe_process_count() <= 1:
        return [obj]
    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(obj).encode("utf-8")
    # exchange lengths, pad, then gather fixed-size buffers
    max_len = int(multihost_utils.process_allgather(
        np.asarray(len(payload))).max())
    buf = np.zeros(max_len, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    lengths = multihost_utils.process_allgather(np.asarray(len(payload)))
    buffers = multihost_utils.process_allgather(buf)
    out = []
    for length, data in zip(np.atleast_1d(lengths), np.atleast_2d(buffers)):
        out.append(json.loads(bytes(data[: int(length)]).decode("utf-8")))
    return out
