#!/usr/bin/env python
"""Benchmark: full training-step throughput of the flagship TS-ASR model.

Measures samples/sec/chip for the scratch-variant Conformer transducer
(12-layer d256 encoder + 6-layer speaker encoder + LSTM predictor + RNN-T
loss + AdamW update) on a realistic dynamic-batch shape (the recipe packs
<= 50 s of audio per batch per rank, conformer-t_scratch.yaml:64-73).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a documented engineering estimate of the PyTorch recipe's
per-GPU throughput on its 8xV100 setup (~8 samples/s/GPU for ~4 s
utterances at batch*accum that fills 50 s/rank: V100 fp32/amp Conformer-T
recipes of this size typically sustain ~0.5-1x real-time x batch).
Driver-recorded BENCH_r{N}.json values supersede this estimate across
rounds.
"""

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 8.0   # documented estimate, see above


def main():
    import os

    import jax

    # persistent compilation cache: compiles over the TPU tunnel are
    # slow and variable; priming this dir makes reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from tsasr_tpu.models.transducer import TSTransducer, TSTransducerConfig
    from tsasr_tpu.ops import Fbank, input_normalization
    from tsasr_tpu.ops.rnnt_loss import rnnt_loss
    from tsasr_tpu.training.schedulers import noam_schedule

    import os

    # realistic 2-mix bucket: 12 x 4 s mixture (48 s audio/batch),
    # 5 s enrollments, ~60 char targets
    B, mix_sec, enr_sec, U = 12, 4, 5, 60
    sr = 16000
    # bf16 compute is the TPU-native production configuration (the
    # reference's bf16_mix_prec equivalent); BENCH_PRECISION=fp32 to
    # measure the full-precision path
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, mix_sec * sr)) * 0.1, jnp.float32)
    enroll = jnp.asarray(rng.normal(size=(B, enr_sec * sr)) * 0.1,
                         jnp.float32)
    rel = jnp.ones((B,), jnp.float32)
    tokens_bos = jnp.asarray(rng.integers(1, 29, size=(B, U + 1)),
                             jnp.int32)
    tokens_bos = tokens_bos.at[:, 0].set(0)

    cfg = TSTransducerConfig(
        injection_mode="cat",
        dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32)
    model = TSTransducer(cfg)
    fbank = Fbank(sample_rate=sr, n_fft=512, n_mels=80, win_length=32.0)

    def features(w, r):
        return input_normalization(fbank(w), r)

    params = model.init(jax.random.PRNGKey(0), features(wav, rel), rel,
                        tokens_bos, features(enroll, rel), rel)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(noam_schedule(1e-3, 10000)))
    opt_state = tx.init(params)

    def train_step(params, opt_state, wav, enroll, rel, tokens_bos):
        def loss_fn(p):
            logits, _ = model.apply(p, features(wav, rel), rel, tokens_bos,
                                    features(enroll, rel), rel,
                                    deterministic=True)
            tokens = tokens_bos[:, 1:]
            t_lens = jnp.round(rel * logits.shape[1]).astype(jnp.int32)
            u_lens = jnp.full((B,), U, jnp.int32)
            return rnnt_loss(logits, tokens, t_lens, u_lens,
                             reduction="mean")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # Multiple optimizer steps per dispatch (lax.scan over a stack of
    # distinct batches): measures device throughput rather than
    # host/tunnel dispatch latency — the real production shape, where
    # the input pipeline runs ahead of the device. Distinct per-step
    # batches keep XLA from hoisting any batch compute out of the loop.
    steps_per_call = int(os.environ.get("BENCH_STEPS_PER_CALL", "5"))
    wavs = jnp.asarray(
        rng.normal(size=(steps_per_call, B, mix_sec * sr)) * 0.1,
        jnp.float32)
    enrolls = jnp.asarray(
        rng.normal(size=(steps_per_call, B, enr_sec * sr)) * 0.1,
        jnp.float32)
    tokens_stack = jnp.asarray(
        rng.integers(1, 29, size=(steps_per_call, B, U + 1)),
        jnp.int32).at[:, :, 0].set(0)

    def multi_step(params, opt_state, wavs, enrolls, rel, tokens_stack):
        def body(carry, xs):
            p, o = carry
            w, e, tb = xs
            p, o, loss = train_step(p, o, w, e, rel, tb)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (wavs, enrolls, tokens_stack))
        return params, opt_state, losses[-1]

    step = jax.jit(multi_step, donate_argnums=(0, 1))

    # warmup: compile AND pay the tunnel's one-time first-readback setup
    # (~80 s on this deployment) outside the timed section
    params, opt_state, loss = step(params, opt_state, wavs, enrolls,
                                   rel, tokens_stack)
    float(loss)

    n_calls = 5
    times = []
    for _ in range(n_calls):
        start = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, wavs, enrolls,
                                       rel, tokens_stack)
        float(loss)   # real device->host read: cannot return early
        times.append(time.perf_counter() - start)
    per_call = float(np.median(times))

    n_chips = max(len(jax.devices()), 1)
    samples_per_sec_per_chip = (B * steps_per_call) / per_call / n_chips
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec_per_chip, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec_per_chip
                             / BASELINE_SAMPLES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
