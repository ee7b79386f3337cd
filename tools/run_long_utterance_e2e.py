#!/usr/bin/env python
"""Long-utterance END-TO-END training proof on the real TPU (r4 verdict
item 7).

Kernel micro-benches (``tools/bench_long_utterance.py``,
``tools/prove_rnnt_slab.py``) already cover the loss at long T; what was
missing is one real ``train_librispeechmix_none.py`` fit at the
reference's 60 s operating point (``conformer-t_scratch.yaml:42-44``:
``train_remove_if_longer: 60.0``), engaging the production long-lattice
loss path inside the full recipe (features + augment + model + loss +
optimizer + checkpointing + on-device decode).

Runs the entry point on a synthetic ~55 s-mixture corpus (T≈1375
encoder frames, U≈770 tokens, production dims) twice:

1. default — ``variant="auto"`` fused joint+head+loss, which on TPU
   streams the oversized lattice through the T-slab Pallas kernel
   (``ops/rnnt_loss_pallas.py``);
2. banded  — ``--joint_band_width 128`` (O(T*W) diagonal band).

Per-step wall times come from the Brain's TSASR_LOG_STEP_TIMES
instrumentation (device-synced, first 2 compile steps excluded).
Writes ``reports/long_utterance_e2e_r5.json`` + copies train logs.

Usage:
    python tools/run_long_utterance_e2e.py [--data /tmp/data_long]
        [--work /tmp/longfit] [--variants default banded]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(data_folder, n_mix=24, seed=7):
    if os.path.exists(os.path.join(data_folder, "train-2mix.jsonl")):
        return
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_synthetic_dataset import make_dataset
    make_dataset(data_folder, n_speakers=4, utts_per_speaker=4,
                 n_mix=n_mix, min_dur=50.0, max_dur=55.0, seed=seed)


def count_vocab(data_folder):
    chars = set()
    for name in os.listdir(data_folder):
        if name.endswith(".jsonl"):
            for line in open(os.path.join(data_folder, name)):
                for text in json.loads(line)["texts"]:
                    chars.update(text.replace(" ", ""))
    return len(chars) + 1


def run_variant(name, extra, data, work, vocab, epochs, batch):
    out = os.path.join(work, name)
    env = dict(os.environ, TSASR_LOG_STEP_TIMES="1",
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    args = [sys.executable, "train_librispeechmix_none.py",
            "hparams/LibriSpeechMix/conformer-t_none.yaml",
            "--data_folder", data, "--output_folder", out,
            "--vocab_size", str(vocab), "--beam_size", "1",
            "--debug", "--debug_batches", "6",
            "--debug_epochs", str(epochs),
            "--dynamic_batching", "False",
            "--train_batch_size", str(batch),
            # ONE static shape for the whole run: every batch pads to
            # 56 s audio / 800 tokens. Without this the 0.32 s/16-token
            # quantization yields a fresh (T, U) combo nearly every
            # batch, and each one is a multi-minute XLA compile over
            # the tunnel (measured: ~130 s/step wall on the first
            # attempt, all compile).
            "--pad_to_multiple",
            "{mixed_sig: 896000, enroll_sig: 896000, "
            "tokens_bos: 800, tokens: 800}",
            "--num_epochs", str(epochs), *extra]
    print(f"[long-e2e] {name}: {' '.join(args[1:])}", flush=True)
    log = os.path.join(work, f"{name}.stdout.log")
    with open(log, "w") as f:
        rc = subprocess.run(args, cwd=REPO, env=env, stdout=f,
                            stderr=subprocess.STDOUT).returncode
    if rc != 0:
        tail = open(log, errors="replace").read()[-3000:]
        raise RuntimeError(f"{name} failed rc={rc}:\n{tail}")
    steps = []
    for line in open(os.path.join(out, "log.txt"), errors="replace"):
        m = re.search(
            r"step times \(epoch (\d+), n=(\d+) warm of (\d+)\): "
            r"median ([\d.]+) ms, p90 ([\d.]+) ms, first ([\d.]+) ms",
            line)
        if m:
            steps.append({"epoch": int(m.group(1)),
                          "n_warm": int(m.group(2)),
                          "median_ms": float(m.group(4)),
                          "p90_ms": float(m.group(5)),
                          "first_ms": float(m.group(6))})
    losses = [float(x) for x in re.findall(
        r"train loss: ([\d.e+-]+)",
        open(os.path.join(out, "train_log.txt"), errors="replace").read())]
    return {"variant": name, "overrides": list(extra),
            "step_times": steps, "train_losses": losses}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/data_long")
    ap.add_argument("--work", default="/tmp/longfit")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--variants", nargs="+",
                    default=["default", "banded"])
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    make_data(args.data)
    vocab = count_vocab(args.data)
    print(f"[long-e2e] vocab_size {vocab}")

    variants = {
        "default": [],
        "banded": ["--joint_band_width", "128"],
    }
    results = []
    for name in args.variants:
        results.append(run_variant(name, variants[name], args.data,
                                   args.work, vocab, args.epochs,
                                   args.batch))
    doc = {
        "config": {"mixture_seconds": "50-55 (T~1375 encoder frames)",
                   "batch": args.batch, "epochs": args.epochs,
                   "dims": "production d256/12L conformer-t",
                   "steps_per_epoch": 6},
        "results": results,
    }
    out = os.path.join(REPO, "reports", "long_utterance_e2e_r5.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    for name in args.variants:
        shutil.copy(os.path.join(args.work, name, "train_log.txt"),
                    os.path.join(REPO, "reports",
                                 f"long_utterance_e2e_r5_{name}.txt"))
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
