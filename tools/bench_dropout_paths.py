#!/usr/bin/env python
"""Where do dropout's ~10 ms go, and which variant is fastest on-chip?

perf_r3.md 4b decomposed the production step (B=96, 4 s) and left
~17 ms attributed to dropout at bits=32, ~10 ms residual at the
production bits=8 (the r4 verdict names this the #2 MFU lever). This
tool measures the candidate mechanisms DIRECTLY on the real chip at the
step's dominant mask volume so the next move is chosen from data:

1. ``rbg_u8``      — one RngBitGenerator call emitting uint8 at the
                     full per-step mask volume (what bits=8 does today,
                     summed over sites).
2. ``rbg_u32cast`` — the same byte volume drawn as uint32 and bitcast
                     to uint8: if the TPU RBG emits 32-bit lanes and
                     the u8 request internally truncates (4x waste),
                     this wins ~4x; if u8 is native, it ties.
3. ``rbg_u8_persite`` — the volume split across the 36 dominant
                     per-site calls (2 FFN sites x 18 layers): call
                     overhead + per-call state chaining vs one draw.
4. ``mask_apply``  — draw + compare + where on a bf16 operand
                     (the full per-site dropout chain, fwd only).
5. ``threefry_u8`` — the same volume from the counter-based threefry
                     PRNG (the r3 baseline rbg replaced).

Prints one JSON object; writes reports/bench_dropout_paths_r5.json.
Run on the real TPU (axon); sizes follow bench.py's headline config.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    """Median ms of fn(step, *args) with a FRESH step index per call
    and a HOST FETCH of the scalar result per call.

    Two axon-tunnel traps found the hard way (both r5):

    1. Identical (executable, args) pairs return cached results — every
       variant folds a fresh step index into its key INSIDE jit.
    2. ``block_until_ready`` is effectively a no-op over the tunnel
       (the client's arrays resolve asynchronously): a 736 MB u8 draw
       "completed" in 0.04 ms (~19 TB/s, physically impossible), while
       fetching a scalar reduction of the same program took 44 ms.
       Every variant therefore RETURNS A SCALAR and the timer blocks on
       ``float(out)`` — the only reliable completion barrier here.
    """
    float(fn(0, *args))
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        out = float(fn(i, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # headline step's dominant mask sites: 2 inner-FFN masks per layer,
    # (B*T', d_ffn) = (96*104, 2048), for 12 encoder + 6 speaker layers
    # (speaker T'=126 at 5 s enroll; close enough to use one shape)
    site = (9984, 2048)
    if os.environ.get("BENCH_DROPOUT_SITE"):        # CPU smoke tests
        site = tuple(int(x) for x in
                     os.environ["BENCH_DROPOUT_SITE"].split(","))
    n_sites = int(os.environ.get("BENCH_DROPOUT_NSITES", "36"))
    total = site[0] * site[1] * n_sites        # ~736M u8 draws / step

    key = jax.random.key(0, impl="rbg")
    tkey = jax.random.key(0)                   # threefry

    @jax.jit
    def rbg_u8(step, k):
        k = jax.random.fold_in(k, step)
        return jnp.sum(jax.random.bits(k, (total,), dtype=jnp.uint8),
                       dtype=jnp.float32)

    @jax.jit
    def rbg_u32cast(step, k):
        # same BYTE volume drawn as u32: isolates the generator's
        # per-byte rate from the output element width. (A bitcast back
        # to u8 is free in-kernel; materializing it as a (N,4) u8 array
        # would lane-pad 4->128 and explode HBM, so don't.)
        k = jax.random.fold_in(k, step)
        return jnp.sum(jax.random.bits(k, (total // 4,),
                                       dtype=jnp.uint32) >> 24,
                       dtype=jnp.float32)

    @jax.jit
    def rbg_u8_persite(step, k):
        k = jax.random.fold_in(k, step)
        ks = jax.random.split(k, n_sites)
        outs = [jax.random.bits(ks[i], site, dtype=jnp.uint8)
                for i in range(n_sites)]
        # full-array reduction so XLA cannot fuse rng+slice down to a
        # single generated tile (a bare [0,0] would allow that)
        return sum(jnp.sum(o, dtype=jnp.float32) for o in outs)

    x = jnp.ones(site, jnp.bfloat16)

    @jax.jit
    def mask_apply(step, k, x):
        k = jax.random.fold_in(k, step)
        ks = jax.random.split(k, n_sites)
        acc = jnp.zeros((), jnp.float32)
        for i in range(n_sites):
            bits = jax.random.bits(ks[i], site, dtype=jnp.uint8)
            y = jnp.where(bits < jnp.uint8(230),
                          x / 0.9, 0.0).astype(x.dtype)
            acc = acc + jnp.sum(y, dtype=jnp.float32)
        return acc

    @jax.jit
    def threefry_u8(step, k):
        k = jax.random.fold_in(k, step)
        return jnp.sum(jax.random.bits(k, (total,), dtype=jnp.uint8),
                       dtype=jnp.float32)

    result = {
        "platform": jax.devices()[0].platform,
        "total_u8_draws": total,
        "n_sites": n_sites,
        "site_shape": list(site),
        "ms": {
            "rbg_u8_one_call": timeit(rbg_u8, key),
            "rbg_u32_same_bytes_one_call": timeit(rbg_u32cast, key),
            "rbg_u8_per_site_36_calls": timeit(rbg_u8_persite, key),
            "mask_apply_36_sites_fwd": timeit(mask_apply, key, x),
            "threefry_u8_one_call": timeit(threefry_u8, tkey),
        },
    }
    ms = result["ms"]
    # sanity: effective draw bandwidth; a v5e tops out near ~0.8 TB/s
    # HBM, so anything >> 1000 GB/s means the run was cached/DCE'd
    result["draw_gbps"] = {
        k: round(total / (ms[k] * 1e6), 1)
        for k in ("rbg_u8_one_call", "rbg_u32_same_bytes_one_call",
                  "rbg_u8_per_site_36_calls", "threefry_u8_one_call")}
    result["notes"] = {
        "u32_vs_u8": round(ms["rbg_u8_one_call"]
                           / max(ms["rbg_u32_same_bytes_one_call"],
                                 1e-9), 2),
        "call_overhead_ms": round(ms["rbg_u8_per_site_36_calls"]
                                  - ms["rbg_u8_one_call"], 2),
        "apply_overhead_ms": round(ms["mask_apply_36_sites_fwd"]
                                   - ms["rbg_u8_per_site_36_calls"], 2),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports",
        "bench_dropout_paths_r5.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
