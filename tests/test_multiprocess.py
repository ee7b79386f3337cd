"""Multi-PROCESS execution (round-4 verdict item 1).

The fast test launches two real OS processes via
``tsasr_tpu.parallel.launch`` and exercises ``jax.distributed`` init +
gloo collectives + the distributed helpers. The full fit/eval proof
(single-vs-multi loss equality, WER merge, collective checkpoints) is
``tools/run_multiprocess_proof.py`` — slow-gated here, with its last
committed artifact in ``reports/multiprocess_r4/``.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, %r)
    from tsasr_tpu.parallel.distributed import (
        all_gather_object, ddp_barrier, if_main_process,
        maybe_init_distributed)
    assert maybe_init_distributed()
    import jax
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    got = all_gather_object({"pid": jax.process_index(),
                             "payload": "x" * (10 + jax.process_index())})
    assert [g["pid"] for g in got] == [0, 1], got
    assert [len(g["payload"]) for g in got] == [10, 11]
    ddp_barrier()
    # global-mesh batch sharding across non-addressable devices
    import numpy as np
    from tsasr_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh(dp=8, tp=1)
    b = shard_batch({"x": np.arange(24, dtype=np.float32).reshape(6, 4),
                     "weight": np.ones(6, np.float32)}, mesh)
    assert b["x"].shape == (8, 4)        # padded to the data axis
    assert float(b["weight"].sum()) == 6.0
    print(f"MP_OK process={jax.process_index()}", flush=True)
""") % (REPO,)


def test_two_process_launch_collectives(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    env.pop("TSASR_DIST_COORDINATOR", None)
    proc = subprocess.run(
        [sys.executable, "-m", "tsasr_tpu.parallel.launch",
         "--nproc_per_node", "2", "--devices_per_process", "4",
         "--log_dir", str(tmp_path / "logs"), str(worker)],
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "[p0] MP_OK process=0" in proc.stdout
    assert "[p1] MP_OK process=1" in proc.stdout


@pytest.mark.skipif(not os.environ.get("TSASR_SLOW_TESTS"),
                    reason="full 3-run fit/eval proof; ~20 min on this "
                           "host — artifact: reports/multiprocess_r4/")
def test_full_multiprocess_proof(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "run_multiprocess_proof.py"),
         str(tmp_path / "work")],
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 JAX_PLATFORM_NAME="cpu"),
        capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, proc.stdout[-3000:]
