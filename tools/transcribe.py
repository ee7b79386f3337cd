#!/usr/bin/env python
"""Transcribe audio files with a trained experiment.

Usage:
    python tools/transcribe.py --experiment results/.../0 \
        mix1.wav [mix2.flac ...] [--enroll enroll.wav] [--beam_size 15] \
        [--lm_path lm.msgpack --lm_weight 0.3] [--streaming]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", nargs="+", help="wav/flac files")
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--enroll", default=None,
                    help="enrollment wav (target-speaker variants)")
    ap.add_argument("--beam_size", type=int, default=1)
    ap.add_argument("--lm_path", default=None)
    ap.add_argument("--lm_weight", type=float, default=None)
    ap.add_argument("--streaming", action="store_true",
                    help="chunked streaming decode (causal models)")
    ap.add_argument("--min_key", default="WER")
    args = ap.parse_args()

    from tsasr_tpu.inference import TSASRTranscriber

    t = TSASRTranscriber.from_experiment(
        args.experiment, beam_size=args.beam_size, min_key=args.min_key,
        lm_path=args.lm_path, lm_weight=args.lm_weight)

    for path in args.audio:
        if args.streaming:
            from tsasr_tpu.data.audio import read_audio, resample
            wav, sr = read_audio(path)
            if sr != t.sample_rate:
                wav = resample(wav, sr, t.sample_rate)
            s = t.streaming()
            chunk = t.sample_rate  # 1 s chunks
            for lo in range(0, len(wav), chunk):
                s.accept_chunk(wav[lo: lo + chunk])
            text = s.finalize()
        else:
            text = t.transcribe_file(path, enroll_path=args.enroll)
        print(json.dumps({"file": path, "text": text}))


if __name__ == "__main__":
    main()
