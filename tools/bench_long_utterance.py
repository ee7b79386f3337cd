#!/usr/bin/env python
"""Long-utterance (60 s) train-step benchmark with the banded joint.

The reference's documented ceiling is full (B, T, U, V) logits
materialization at 60 s utterances (SURVEY hard-part 1). With
``joint_band_width`` the joint/loss run on an O(T*W) diagonal band
(ops/rnnt_loss_banded.py), so the full-size model trains on 60 s inputs
without rematerialization tricks. Prints one JSON line.

Usage: python tools/bench_long_utterance.py [--batch 4] [--band 96]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--tokens", type=int, default=600)
    ap.add_argument("--band", type=int, default=96)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tsasr_tpu.models.transducer import TSTransducer, TSTransducerConfig
    from tsasr_tpu.ops import Fbank, input_normalization
    from tsasr_tpu.ops.rnnt_loss_banded import band_centers, rnnt_loss_banded
    from tsasr_tpu.training.schedulers import noam_schedule

    B, sec, U, W = args.batch, args.seconds, args.tokens, args.band
    sr = 16000
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, sec * sr)) * 0.1, jnp.float32)
    enroll = jnp.asarray(rng.normal(size=(B, 5 * sr)) * 0.1, jnp.float32)
    rel = jnp.ones((B,), jnp.float32)
    tokens_bos = jnp.asarray(rng.integers(1, 29, size=(B, U + 1)),
                             jnp.int32).at[:, 0].set(0)

    cfg = TSTransducerConfig(
        injection_mode="cat",
        dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32)
    model = TSTransducer(cfg)
    fbank = Fbank(sample_rate=sr, n_fft=512, n_mels=80, win_length=32.0)

    def features(w, r):
        return input_normalization(fbank(w), r)

    params = model.init(jax.random.PRNGKey(0),
                        features(wav[:1], rel[:1]), rel[:1],
                        tokens_bos[:1], features(enroll[:1], rel[:1]),
                        rel[:1])
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(noam_schedule(1e-3, 10000)))
    opt_state = tx.init(params)
    token_rel = jnp.full((B,), U / (U + 1), jnp.float32)

    def train_step(params, opt_state, wav, enroll, rel, tokens_bos):
        def loss_fn(p):
            feats, r = features(wav, rel), rel
            logits, _ = model.apply(
                p, feats, r, tokens_bos, features(enroll, rel), rel,
                deterministic=True, band_width=W,
                token_rel_lens=token_rel)
            tokens = tokens_bos[:, 1:]
            t_lens = jnp.round(r * logits.shape[1]).astype(jnp.int32)
            u_lens = jnp.full((B,), U, jnp.int32)
            centers = band_centers(t_lens, u_lens, logits.shape[1], W)
            return rnnt_loss_banded(logits, tokens, centers, t_lens,
                                    u_lens, reduction="mean")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, wav, enroll, rel,
                                   tokens_bos)
    float(loss)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(5):
        start = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, wav, enroll,
                                       rel, tokens_bos)
        float(loss)
        times.append(time.perf_counter() - start)
    step_ms = float(np.median(times)) * 1e3
    print(json.dumps({
        "metric": "long_utterance_step_ms",
        "value": round(step_ms, 1),
        "unit": f"ms/step (B={B} x {sec}s, U={U}, band={W})",
        "audio_sec_per_sec": round(B * sec / (step_ms / 1e3), 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(loss), 3),
    }))


if __name__ == "__main__":
    main()
