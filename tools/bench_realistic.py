#!/usr/bin/env python
"""Production-step throughput at a REALISTIC LibriSpeechMix length
distribution (round-4 verdict item 3: the headline bench runs fixed 4 s
rows; padding waste and throughput at real bucketed lengths were never
measured).

Duration model (documented; no real corpus on this host): LibriSpeech
train utterances ~N(12.3 s, 3.5 s) clipped to [1.5, 16.7]; a 2-mix
mixture is max(d1, d2 + delay) with delay ~U[0, d1] — mean ~18.5 s,
p95 ~27 s. Mixtures are assigned to the recipe's DynamicBatchSampler
buckets; this tool measures the REAL production train step (bench.py's
exact configuration: bf16, augment, fused joint+head+loss, AdamW) at a
small set of representative bucket shapes on the TPU and reports the
distribution-weighted aggregate.

Also quantifies the sequence-packing question with numbers:
- padding waste under the recipe's real sampler config at this
  distribution (what packing could recover);
- the attention-FLOP multiplier packing would introduce (dense
  attention computes the full packed T^2 even across segment masks).

Prints one JSON line; also writes reports/bench_realistic_r5.json.

Env knobs: BENCH_FUSED_ATTN=1 swaps in the fused Pallas rel-pos
attention (long-T crossover question); BENCH_BUCKETS=20,24,33 restricts
the sweep to a bucket subset (weights renormalized, result marked
"partial"); BENCH_STEPS_PER_CALL tunes the scan-of-N dispatch.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 197e12
AUDIO_BUDGET_S = 384          # per-batch audio budget, = bench.py's 96x4s
CHARS_PER_MIX_SEC = 9         # ~14 chars/s on the ~2/3 of the mixture
                              # that is the target utterance


def duration_model(n, seed=0):
    rng = np.random.default_rng(seed)
    d1 = np.clip(rng.normal(12.3, 3.5, n), 1.5, 16.7)
    d2 = np.clip(rng.normal(12.3, 3.5, n), 1.5, 16.7)
    delay = rng.uniform(0, d1)
    return np.maximum(d1, d2 + delay)


def padding_waste(durations, num_buckets=80, max_batch_len=50.0,
                  quant_s=0.32):
    """Padded/real audio ratio under the recipe's DynamicBatchSampler
    (ascending ordering, per-batch max + pad_feats_to quantization)."""
    from tsasr_tpu.data.sampler import DynamicBatchSampler

    class _DS:
        def __len__(self):
            return len(durations)

        def __getitem__(self, i):
            return {"duration": durations[i]}

    sampler = DynamicBatchSampler(
        _DS(), max_batch_len, num_buckets=num_buckets,
        length_func=lambda x: x["duration"], shuffle=False,
        batch_ordering="ascending", max_batch_ex=128)
    tot = padded = 0.0
    for batch in sampler:
        ds = durations[np.asarray(batch)]
        tmax = np.ceil(ds.max() / quant_s) * quant_s
        padded += tmax * len(ds)
        tot += ds.sum()
    return padded / tot


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from tools.flops_model import production_step_flops
    from tsasr_tpu.models.transducer import TSTransducer, TSTransducerConfig
    from tsasr_tpu.ops import (Fbank, input_normalization,
                               pad_audio_to_frame_multiple)
    from tsasr_tpu.ops.augment import spec_augment, speed_perturb
    from tsasr_tpu.ops.rnnt_loss_fused import rnnt_loss_fused
    from tsasr_tpu.recipes.librispeechmix import (specaugment_kwargs,
                                                  speed_perturb_kwargs)
    from tsasr_tpu.training.schedulers import noam_schedule

    durations = duration_model(20000)
    waste = padding_waste(durations)

    # representative bucket edges; each duration rounds UP to its bucket
    bucket_edges = [12, 16, 20, 24, 33]
    assigned = np.array([next((b for b in bucket_edges if d <= b),
                              bucket_edges[-1]) for d in durations])
    weights = {b: float((assigned == b).mean()) for b in bucket_edges}
    run_buckets = bucket_edges
    if os.environ.get("BENCH_BUCKETS"):
        run_buckets = [int(b) for b in
                       os.environ["BENCH_BUCKETS"].split(",")]
        assert all(b in bucket_edges for b in run_buckets), run_buckets

    sr = 16000
    enr_sec = 5
    # BENCH_FUSED_ATTN=1: fused Pallas rel-pos attention. Lost by 5% at
    # the headline T=104 (perf_r3.md §4c: XLA's (B,H,T,2T-1) rel-shift
    # materialization is too small to beat at short T); the long
    # realistic buckets (T up to ~830) are where that tensor grows
    # quadratically, so the crossover question is re-asked here.
    fused_attn = os.environ.get("BENCH_FUSED_ATTN", "0") != "0"
    cfg = TSTransducerConfig(injection_mode="cat", dropout_bits=8,
                             fused_attention=fused_attn,
                             dtype=jnp.bfloat16)
    model = TSTransducer(cfg)
    fbank = Fbank(sample_rate=sr, n_fft=512, n_mels=80, win_length=32.0)

    def features(w, r):
        w, r = pad_audio_to_frame_multiple(w, r, 32, sr)
        return input_normalization(fbank(w), r)

    def make_step(B, mix_sec, U):
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(noam_schedule(1e-3, 10000)))

        def train_step(params, opt_state, wav, enroll, rel, tokens_bos,
                       key):
            k_aug, k_drop = jax.random.split(key)

            def loss_fn(p):
                k_speed, k_spec = jax.random.split(k_aug)
                w, factor = speed_perturb(wav, k_speed,
                                          **speed_perturb_kwargs({}, sr))
                r = jnp.minimum(rel * factor, 1.0)
                w, r = pad_audio_to_frame_multiple(w, r, 32, sr)
                feats = input_normalization(fbank(w), r)
                feats = spec_augment(feats, k_spec,
                                     **specaugment_kwargs({}))
                enc, dec = model.apply(p, feats, r, tokens_bos,
                                       features(enroll, rel), rel,
                                       deterministic=False,
                                       rngs={"dropout": k_drop},
                                       method=model.encode_predict)
                head = p["params"]["transducer_head"]
                tokens = tokens_bos[:, 1:]
                t_lens = jnp.round(r * enc.shape[1]).astype(jnp.int32)
                u_lens = jnp.full((B,), U, jnp.int32)
                return rnnt_loss_fused(enc, dec, head["kernel"],
                                       head["bias"], tokens, t_lens,
                                       u_lens, chunk=8, reduction="mean")

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return tx, train_step

    steps_per_call = int(os.environ.get("BENCH_STEPS_PER_CALL", "4"))
    n_calls = 3
    rows = []
    # Per-bucket row cache: a TPU-worker crash/restart mid-sweep (seen
    # once on the tunneled axon backend) only loses the in-flight
    # bucket; a rerun skips completed buckets.
    variant = "_fused_attn" if fused_attn else ""
    rows_cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports",
        f"bench_realistic_rows{variant}.json")
    done = {}
    if os.path.exists(rows_cache):
        with open(rows_cache) as f:
            done = {r["bucket_s"]: r for r in json.load(f)}
    for mix_sec in run_buckets:
        if mix_sec in done:
            rows.append(done[mix_sec])
            print(json.dumps(done[mix_sec]) + "  # cached",
                  file=sys.stderr, flush=True)
            continue
        rng = np.random.default_rng(mix_sec)
        B = max(8, int(AUDIO_BUDGET_S / mix_sec) // 8 * 8)
        U = int(CHARS_PER_MIX_SEC * mix_sec)
        tx, train_step = make_step(B, mix_sec, U)
        wav = jnp.asarray(rng.normal(size=(B, mix_sec * sr)) * 0.1,
                          jnp.float32)
        enroll = jnp.asarray(rng.normal(size=(B, enr_sec * sr)) * 0.1,
                             jnp.float32)
        rel = jnp.ones((B,), jnp.float32)
        tokens_bos = jnp.asarray(
            rng.integers(1, 29, size=(B, U + 1)),
            jnp.int32).at[:, 0].set(0)
        params = model.init(jax.random.PRNGKey(0), features(wav, rel),
                            rel, tokens_bos, features(enroll, rel), rel)
        opt_state = tx.init(params)

        def multi(params, opt_state, wav, enroll, rel, tokens_bos, key):
            keys = jax.random.split(key, steps_per_call)

            def body(carry, k):
                p, o = carry
                p, o, loss = train_step(p, o, wav, enroll, rel,
                                        tokens_bos, k)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys)
            return params, opt_state, losses[-1]

        step = jax.jit(multi, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, wav, enroll,
                                       rel, tokens_bos,
                                       jax.random.key(1, impl="rbg"))
        float(loss)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(n_calls):
            t0 = time.perf_counter()
            params, opt_state, loss = step(
                params, opt_state, wav, enroll, rel, tokens_bos,
                jax.random.key(2 + i, impl="rbg"))
            float(loss)
            times.append(time.perf_counter() - t0)
        per_step = float(np.median(times)) / steps_per_call
        flops = production_step_flops(B=B, mix_sec=mix_sec,
                                      enr_sec=enr_sec, U=U,
                                      augmented=True).train
        row = {
            "bucket_s": mix_sec, "B": B, "U": U,
            "weight": round(weights[mix_sec], 4),
            "samples_per_sec": round(B / per_step, 1),
            "audio_sec_per_sec": round(B * mix_sec / per_step, 1),
            "step_ms": round(per_step * 1e3, 1),
            "mfu_pct": round(flops / per_step / V5E_BF16_PEAK_FLOPS
                             * 100.0, 2),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        done[mix_sec] = row
        with open(rows_cache, "w") as f:
            json.dump([done[b] for b in bucket_edges if b in done], f,
                      indent=2)
        print(json.dumps(row), file=sys.stderr, flush=True)

    # distribution-weighted aggregate: time to process one "average"
    # epoch second of audio = sum_b weight_b / audio_rate_b
    # (weights renormalized over the run subset when BENCH_BUCKETS set)
    wsum = sum(r["weight"] for r in rows)
    inv_rate = sum(r["weight"] / wsum / r["audio_sec_per_sec"]
                   for r in rows)
    agg_audio_rate = 1.0 / inv_rate
    mean_dur = float(durations.mean())
    agg_samples = agg_audio_rate / mean_dur
    agg_mfu = sum(r["weight"] / wsum * r["mfu_pct"] for r in rows)

    result = {
        "metric": "realistic_distribution_train_throughput",
        "fused_attention": fused_attn,
        "partial": len(run_buckets) < len(bucket_edges),
        "value": round(agg_audio_rate, 1),
        "unit": "audio_sec/s/chip",
        "samples_per_sec_per_chip": round(agg_samples, 2),
        "weighted_mfu_pct": round(agg_mfu, 2),
        "mean_mixture_s": round(mean_dur, 2),
        "padding_waste_pct": round((waste - 1) * 100, 2),
        "buckets": rows,
        "packing_verdict": (
            "cannot pay: bucketed padding waste is "
            f"{(waste - 1) * 100:.1f}% (the recoverable ceiling), while "
            "packing S segments per row multiplies dense-attention "
            "FLOPs by ~S vs equal-audio bucketed batches"),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports",
        f"bench_realistic_r5{variant}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
