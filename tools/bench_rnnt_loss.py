#!/usr/bin/env python
"""RNN-T loss microbenchmark: fused Pallas kernel vs XLA wavefront.

Measures value+grad time for both backends on the production logits
shape (dispatch amortized with a scan, like bench.py). Prints one JSON
line. Usage: python tools/bench_rnnt_loss.py [--batch 48] [--frames 101]
[--tokens 60] [--vocab 29]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--frames", type=int, default=101)
    ap.add_argument("--tokens", type=int, default=60)
    ap.add_argument("--vocab", type=int, default=29)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tsasr_tpu.ops.rnnt_loss import rnnt_loss

    B, T, U, V = args.batch, args.frames, args.tokens, args.vocab
    rng = np.random.default_rng(0)
    logits_stack = jnp.asarray(
        rng.normal(size=(args.steps, B, T, U + 1, V)) * 2, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    t_lens = jnp.full((B,), T, jnp.int32)
    u_lens = jnp.full((B,), U, jnp.int32)

    def timed(use_pallas):
        def multi(stack):
            def body(acc, lg):
                val, g = jax.value_and_grad(
                    lambda x: rnnt_loss(x, labels, t_lens, u_lens,
                                        reduction="mean",
                                        use_pallas=use_pallas))(lg)
                return acc + val + g.mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), stack)
            return acc

        fn = jax.jit(multi)
        float(fn(logits_stack))
        times = []
        for _ in range(5):
            start = time.perf_counter()
            float(fn(logits_stack))
            times.append(time.perf_counter() - start)
        return float(np.median(times)) / args.steps * 1e3

    pallas_ms = timed(True)
    xla_ms = timed(False)
    print(json.dumps({
        "metric": "rnnt_loss_pallas_vs_xla",
        "shape": f"B{B}xT{T}xU{U + 1}xV{V}",
        "pallas_ms": round(pallas_ms, 2),
        "xla_ms": round(xla_ms, 2),
        "speedup": round(xla_ms / pallas_ms, 2),
    }))


if __name__ == "__main__":
    main()
