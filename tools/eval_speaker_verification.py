#!/usr/bin/env python
"""Speaker-verification evaluation over a trial list.

Scores (enrol, test) audio pairs with a speaker-embedding backend and
reports EER / minDCF (reference: the SpeakerRecognition pretrained
interface + VoxCeleb verification recipes).

Trial list format (one per line): ``<label 0|1> <enrol_path> <test_path>``

Usage:
    python tools/eval_speaker_verification.py --trials trials.txt \
        --backend wavlm --model_path /path/to/wavlm_sv_ckpt
    python tools/eval_speaker_verification.py --trials trials.txt \
        --backend ecapa --model_path ecapa_params.msgpack [--n_mels 80]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", required=True)
    ap.add_argument("--backend", choices=["wavlm", "ecapa"],
                    default="wavlm")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--n_mels", type=int, default=80)
    ap.add_argument("--out", default=None, help="scores file")
    args = ap.parse_args()

    from tsasr_tpu.inference.speaker import SpeakerRecognition
    from tsasr_tpu.utils.metric_stats import BinaryMetricStats

    if args.backend == "wavlm":
        sr = SpeakerRecognition.from_wavlm(args.model_path,
                                           sample_rate=args.sample_rate)
    else:
        import flax.serialization
        import jax
        import numpy as np

        from tsasr_tpu.models.ecapa import ECAPA_TDNN, ECAPAConfig
        from tsasr_tpu.ops import Fbank

        with open(args.model_path, "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        cfg = ECAPAConfig(input_size=args.n_mels,
                          **{k: tuple(v) if isinstance(v, list) else v
                             for k, v in payload.get("config",
                                                     {}).items()})
        model = ECAPA_TDNN(cfg)
        variables = {k: jax.tree.map(np.asarray, v)
                     for k, v in payload.items() if k != "config"}
        fbank = Fbank(sample_rate=args.sample_rate, n_fft=512,
                      n_mels=args.n_mels, win_length=32.0)
        sr = SpeakerRecognition.from_ecapa(model, variables, fbank,
                                           sample_rate=args.sample_rate)

    stats = BinaryMetricStats()
    cache = {}

    def embed(path):
        if path not in cache:
            cache[path] = sr.encode_file(path)
        return cache[path]

    scores_out = []
    with open(args.trials) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if len(parts) != 3:
                continue
            label, enrol, test = int(parts[0]), parts[1], parts[2]
            score = float(SpeakerRecognition.cosine(embed(enrol),
                                                    embed(test)))
            stats.append([f"trial{i}"], [score], [label])
            scores_out.append((label, enrol, test, score))

    summary = stats.summarize()
    if args.out:
        with open(args.out, "w") as f:
            for label, enrol, test, score in scores_out:
                f.write(f"{label} {enrol} {test} {score:.6f}\n")
    print(json.dumps({"trials": len(scores_out),
                      "EER": round(float(summary["EER"]), 5),
                      "minDCF": round(float(summary["minDCF"]), 5)}))


if __name__ == "__main__":
    main()
