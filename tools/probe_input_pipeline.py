#!/usr/bin/env python
"""Host input-pipeline throughput probe (TPU-starvation risk gauge).

SURVEY.md hard-part 6: the host does on-the-fly mixture synthesis
(decode + resample + gain/delay/sum) per example; if the loader cannot
produce audio faster than the device consumes it, the TPU starves. This
probe measures the full host path — manifest -> dynamic items (audio
decode, mixing, tokenization) -> PaddedBatch with TPU quantization —
and reports produced audio-seconds per wall-second, compared to the
device's measured consumption (bench.py throughput x mixture length).

Usage:
    python tools/probe_input_pipeline.py --data_folder /tmp/data \
        [--device_samples_per_sec 400] [--mix_sec 4]

Prints one JSON line:
    {"host_audio_sec_per_sec": ..., "host_samples_per_sec": ...,
     "device_samples_per_sec": ..., "starvation_ratio": ...}
starvation_ratio > 1 means the host keeps up (with the measured margin).
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
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--hparams", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hparams", "LibriSpeechMix", "conformer-t_scratch.yaml"))
    ap.add_argument("--device_samples_per_sec", type=float, default=None,
                    help="measured device throughput (bench.py); "
                         "enables the starvation ratio")
    ap.add_argument("--mix_sec", type=float, default=4.0)
    ap.add_argument("--seconds", type=float, default=20.0,
                    help="probe duration")
    ap.add_argument("--vocab_size", type=int, default=None)
    ap.add_argument("--workers_sweep", type=str, default=None,
                    help="comma-separated num_workers values, e.g. "
                         "'0,1,2,4': measure each and print one JSON "
                         "row per value (round-4 verdict item 7 — host "
                         "pipeline scaling vs worker count)")
    ap.add_argument("--worker_mode", default="thread",
                    choices=["thread", "process"],
                    help="loader worker mode for the sweep (process = "
                         "forked item-evaluation workers)")
    ap.add_argument("--split_timing", action="store_true",
                    help="measure item evaluation (decode+mix+tokenize; "
                         "per-utterance, process-parallelizable) "
                         "separately from PaddedBatch collation (the "
                         "serial tail), and print a measured Amdahl "
                         "extrapolation to multi-core hosts")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    from tsasr_tpu.recipes.librispeechmix import (
        build_dataloader_kwargs,
        dataio_prepare,
    )
    from tsasr_tpu.data.loader import SaveableDataLoader
    from tsasr_tpu.data.prepare import prepare_librispeechmix
    from tsasr_tpu.data.tokenizer import train_tokenizer
    from tsasr_tpu.utils.hparams import load_hyperpyyaml

    with open(args.hparams) as f:
        hparams = load_hyperpyyaml(f, overrides={
            "data_folder": args.data_folder,
            "output_folder": "/tmp/probe_input_pipeline"})
    os.makedirs(hparams["save_folder"], exist_ok=True)
    prepare_librispeechmix(
        data_folder=args.data_folder,
        save_folder=hparams["save_folder"],
        splits=hparams["splits"])
    # the yaml's manifest keys point under save_folder
    if not os.path.exists(hparams["train_json"]):
        raise FileNotFoundError(hparams["train_json"])

    import glob
    import json as _json
    texts = []
    for manifest in glob.glob(os.path.join(args.data_folder,
                                           "train*.jsonl")):
        with open(manifest) as f:
            for line in f:
                texts.extend(_json.loads(line)["texts"])
    if args.vocab_size is None:
        chars = {c for t in texts
                 for c in ("▁" + t.replace(" ", "▁"))}
        args.vocab_size = len(chars) + 1
    tokenizer = train_tokenizer(hparams["save_folder"], texts,
                                vocab_size=args.vocab_size,
                                model_type="char")

    train_data, _, _ = dataio_prepare(hparams, tokenizer)
    kwargs = build_dataloader_kwargs(hparams, train_data, "train")

    def measure(num_workers):
        kw = dict(kwargs, num_workers=num_workers,
                  worker_mode=(args.worker_mode if num_workers else
                               "thread"))
        loader = SaveableDataLoader(train_data, **kw)
        start = time.perf_counter()
        audio_sec = 0.0
        n_samples = 0
        n_batches = 0
        deadline = start + args.seconds
        while time.perf_counter() < deadline:
            for batch in loader:
                sig = batch.mixed_sig
                lens = sig.lengths * sig.data.shape[1]
                audio_sec += float(lens.sum()) / hparams["sample_rate"]
                n_samples += sig.data.shape[0]
                n_batches += 1
                if time.perf_counter() >= deadline:
                    break
        elapsed = time.perf_counter() - start
        result = {
            "num_workers": num_workers,
            "worker_mode": kw["worker_mode"],
            "host_audio_sec_per_sec": round(audio_sec / elapsed, 2),
            "host_samples_per_sec": round(n_samples / elapsed, 2),
            "batches": n_batches,
            "probe_seconds": round(elapsed, 2),
        }
        if args.device_samples_per_sec:
            device_audio_rate = args.device_samples_per_sec * args.mix_sec
            result["device_samples_per_sec"] = args.device_samples_per_sec
            result["starvation_ratio"] = round(
                audio_sec / elapsed / device_audio_rate, 3)
        return result

    def measure_split():
        """Amdahl split (round-4 verdict item 7): this host has ONE
        core, so multi-core scaling cannot be measured directly — but
        its two ingredients can. Item evaluation (FLAC decode + mixture
        synthesis + tokenization) is per-utterance and scales with
        process workers; PaddedBatch collation consumes every item in
        batch order and is the serial tail. Measuring each per
        audio-second gives the scaling model
            rate(C) = 1 / (t_item / C + t_collate)   [audio-s/s]
        with NO free parameters."""
        loader = SaveableDataLoader(train_data, **dict(kwargs,
                                                       num_workers=0))
        batches = []
        deadline = time.perf_counter() + args.seconds
        for indices in loader._batch_indices():
            batches.append(list(indices))
            if time.perf_counter() >= deadline:
                break

        # item evaluation only
        start = time.perf_counter()
        audio_sec = 0.0
        items_by_batch = []
        sr = hparams["sample_rate"]
        deadline = start + args.seconds
        for indices in batches:
            items = [train_data[i] for i in indices]
            items_by_batch.append(items)
            audio_sec += sum(len(it["mixed_sig"]) for it in items) / sr
            if time.perf_counter() >= deadline:
                break
        t_item = (time.perf_counter() - start) / audio_sec

        # collation only (pre-evaluated items)
        start = time.perf_counter()
        audio_sec = 0.0
        reps = 0
        while time.perf_counter() - start < args.seconds / 2:
            for items in items_by_batch:
                loader.collate_fn(items)
                audio_sec += sum(len(it["mixed_sig"])
                                 for it in items) / sr
            reps += 1
        t_collate = (time.perf_counter() - start) / audio_sec

        result = {
            "t_item_us_per_audio_sec": round(t_item * 1e6, 2),
            "t_collate_us_per_audio_sec": round(t_collate * 1e6, 2),
            "serial_fraction": round(t_collate / (t_item + t_collate),
                                     4),
            "model": "rate(C) = 1/(t_item/C + t_collate) audio-s/s "
                     "(process workers evaluate items; collation "
                     "stays serial)",
        }
        for cores in (1, 2, 4, 8, 14, 28):
            rate = 1.0 / (t_item / cores + t_collate)
            result[f"audio_sec_per_sec_at_{cores}_cores"] = round(rate,
                                                                  1)
            result[f"saturation_device_samples_per_sec_at_"
                   f"{cores}_cores"] = round(rate / args.mix_sec, 1)
        return result

    if args.split_timing:
        print(json.dumps(measure_split()))
    elif args.workers_sweep:
        for w in (int(x) for x in args.workers_sweep.split(",")):
            print(json.dumps(measure(w)))
    else:
        print(json.dumps(measure(kwargs.get("num_workers", 0))))


if __name__ == "__main__":
    main()
