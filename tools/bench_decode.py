#!/usr/bin/env python
"""Inference-path throughput bench: features -> speaker branch ->
encoder -> {greedy | batched beam} decode on the real TPU chip.

Makes the README's decode realtime factors reproducible (they were
one-off measurements in round 2). The measured pipeline is the full
TEST path of the recipe: fbank + normalization for mixture and
enrollment, speaker embedding, encoder forward, then the on-device
searcher. Each stage is jitted exactly as the recipe runs it (encode
and search are separate dispatches, as in `TSASRBrain.compute_forward`
eval mode).

Usage:  python tools/bench_decode.py [--batch 96] [--beam 15]

Prints ONE JSON line:
  {"greedy_rtf": ..., "beam_rtf": ..., "greedy_samples_per_sec": ...,
   "beam_samples_per_sec": ..., "audio_sec_per_batch": ...}
RTF = seconds of audio transcribed per wall second (higher is better).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--beam", type=int, default=15)
    ap.add_argument("--mix_sec", type=float, default=4.0)
    ap.add_argument("--enr_sec", type=float, default=5.0)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--n_calls", type=int, default=10)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tsasr_tpu.decoding import (
        BatchedBeamSearcher,
        TransducerGreedySearcher,
    )
    from tsasr_tpu.models.transducer import TSTransducer, TSTransducerConfig
    from tsasr_tpu.ops import (Fbank, input_normalization,
                               pad_audio_to_frame_multiple)

    B = args.batch
    sr = 16000
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, int(args.mix_sec * sr))) * 0.1,
                      jnp.float32)
    enroll = jnp.asarray(
        rng.normal(size=(B, int(args.enr_sec * sr))) * 0.1, jnp.float32)
    rel = jnp.ones((B,), jnp.float32)

    cfg = TSTransducerConfig(
        injection_mode="cat",
        dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32)
    model = TSTransducer(cfg)
    fbank = Fbank(sample_rate=sr, n_fft=512, n_mels=80, win_length=32.0)

    def features(w, r):
        w, r = pad_audio_to_frame_multiple(w, r, 32, sr)
        return input_normalization(fbank(w), r), r

    feats, frel = features(wav, rel)
    efeats, _ = features(enroll, rel)
    params = model.init(jax.random.PRNGKey(0), feats, frel,
                        jnp.zeros((B, 2), jnp.int32), efeats, rel)

    @jax.jit
    def encode(wav, enroll, rel):
        feats, frel = features(wav, rel)
        efeats, _ = features(enroll, rel)
        spk = model.apply(params, efeats, rel,
                          method=model.extract_speaker)
        enc = model.apply(params, feats, frel, spk, rel,
                          method=model.encode)
        return enc, frel

    greedy = TransducerGreedySearcher(model, params)
    beam = BatchedBeamSearcher(model, params, beam_size=args.beam,
                               expand_beam=2.3)

    audio_sec = float(B * args.mix_sec)
    results = {}
    for name, searcher in (("greedy", greedy), ("beam", beam)):
        def run():
            enc, frel = encode(wav, enroll, rel)
            hyps = searcher(enc, frel)
            return hyps

        hyps = run()                       # compile both dispatches
        times = []
        for _ in range(args.n_calls):
            t0 = time.perf_counter()
            hyps = run()
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[f"{name}_rtf"] = round(audio_sec / dt, 1)
        results[f"{name}_samples_per_sec"] = round(B / dt, 1)
        results[f"{name}_ms_per_batch"] = round(dt * 1e3, 2)
        results[f"{name}_first_hyp_len"] = len(hyps[0][0])

    results["audio_sec_per_batch"] = audio_sec
    results["batch"] = B
    results["beam_size"] = args.beam
    print(json.dumps(results))


if __name__ == "__main__":
    main()
