"""Multi-process launcher — the reference's ``torch.distributed.launch``
equivalent (``/root/reference/README.md:38-51``).

The reference scales out by launching one torch process per GPU::

    python -m torch.distributed.launch --nproc_per_node=2 \\
        train_librispeechmix_scratch.py hparams/... --distributed_launch

Here the same shape launches one JAX process per host (on TPU pods,
one per chip-set)::

    python -m tsasr_tpu.parallel.launch --nproc_per_node=2 \\
        train_librispeechmix_none.py hparams/... [overrides]

Each worker gets ``TSASR_DIST_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}``
in its environment; ``parse_arguments`` (which every entry point calls
first) picks those up and runs ``jax.distributed.initialize`` before
any device is touched (``distributed.maybe_init_distributed``).

``--devices_per_process N`` (CPU testing) gives every worker N virtual
CPU devices via ``--xla_force_host_platform_device_count`` — the same
virtual-mesh trick the test suite uses, extended across real OS
processes. On real TPU pods the flag is omitted and each process owns
its locally-attached chips.

Worker stdout/stderr is streamed line-by-line with a ``[p{i}]`` prefix
and (with ``--log_dir``) teed to per-process files. A worker failure
terminates the others and propagates its exit code.
"""

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _pump(proc, idx, log_path):
    log = open(log_path, "w", buffering=1) if log_path else None
    for raw in proc.stdout:
        line = raw.decode("utf-8", "replace")
        sys.stdout.write(f"[p{idx}] {line}")
        sys.stdout.flush()
        if log:
            log.write(line)
    if log:
        log.close()


def launch(script_argv, nproc, devices_per_process=None, log_dir=None,
           coordinator_port=None, env=None):
    """Spawn ``nproc`` workers of ``script_argv``; returns max exit code."""
    port = coordinator_port or _free_port()
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
    procs, pumps = [], []
    for i in range(nproc):
        wenv = dict(env if env is not None else os.environ)
        wenv["TSASR_DIST_COORDINATOR"] = f"localhost:{port}"
        wenv["TSASR_DIST_NUM_PROCESSES"] = str(nproc)
        wenv["TSASR_DIST_PROCESS_ID"] = str(i)
        if devices_per_process:
            flags = wenv.get("XLA_FLAGS", "")
            wenv["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{devices_per_process}").strip()
        proc = subprocess.Popen([sys.executable] + list(script_argv),
                                env=wenv, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT)
        procs.append(proc)
        log_path = (os.path.join(log_dir, f"proc{i}.log")
                    if log_dir else None)
        t = threading.Thread(target=_pump, args=(proc, i, log_path),
                             daemon=True)
        t.start()
        pumps.append(t)

    rc = 0
    try:
        for proc in procs:
            rc = max(rc, proc.wait())
            if rc != 0:
                break
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.send_signal(signal.SIGTERM)
        for proc in procs:
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
        for t in pumps:
            t.join(timeout=10)
    return rc


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="tsasr_tpu multi-process launcher",
        usage="python -m tsasr_tpu.parallel.launch --nproc_per_node N "
              "script.py [script args...]")
    parser.add_argument("--nproc_per_node", type=int, required=True)
    parser.add_argument("--devices_per_process", type=int, default=None,
                        help="virtual CPU devices per worker (testing)")
    parser.add_argument("--log_dir", type=str, default=None)
    parser.add_argument("--coordinator_port", type=int, default=None)
    parser.add_argument("script", nargs=argparse.REMAINDER,
                        help="entry point + its arguments")
    args = parser.parse_args(argv)
    if not args.script:
        parser.error("missing script to launch")
    rc = launch(args.script, args.nproc_per_node,
                devices_per_process=args.devices_per_process,
                log_dir=args.log_dir,
                coordinator_port=args.coordinator_port)
    sys.exit(rc)


if __name__ == "__main__":
    main()
