#!/usr/bin/env python
"""Per-utterance WER analysis from Kaldi-style wer_*.txt reports.

Equivalent of the reference ``tools/plot_wer.py``: parses the report
written by ``ErrorRateStats.write_stats``, extracts per-utterance WER
details, and plots histograms / scatter comparisons across experiments
plus a ranked list of the worst utterances.
"""

import argparse
import os
import re

UTT_LINE = re.compile(
    r"^(?P<key>\S+), %WER (?P<wer>[-\d.]+) \[ (?P<edits>\d+) / "
    r"(?P<ref>\d+), (?P<ins>\d+) ins, (?P<del>\d+) del, "
    r"(?P<sub>\d+) sub \]")
SUMMARY_LINE = re.compile(r"^%WER ([-\d.]+) \[")


def parse_wer_file(path):
    """-> (corpus_wer, {utt_key: detail dict})."""
    corpus_wer = None
    utts = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if corpus_wer is None:
                match = SUMMARY_LINE.match(line)
                if match:
                    corpus_wer = float(match.group(1))
                    continue
            match = UTT_LINE.match(line)
            if match:
                d = match.groupdict()
                utts[d["key"]] = {
                    "WER": float(d["wer"]),
                    "num_edits": int(d["edits"]),
                    "num_ref_tokens": int(d["ref"]),
                    "insertions": int(d["ins"]),
                    "deletions": int(d["del"]),
                    "substitutions": int(d["sub"]),
                }
    return corpus_wer, utts


def plot_wer(paths, output_dir="wer_plots", formats=("jpg",),
             labels=None, top_k=20):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    os.makedirs(output_dir, exist_ok=True)
    parsed = {}
    for i, path in enumerate(paths):
        label = labels[i] if labels else os.path.basename(path)
        parsed[label] = parse_wer_file(path)

    # WER histogram per experiment
    fig, ax = plt.subplots(figsize=(7, 4))
    for label, (corpus, utts) in parsed.items():
        wers = [u["WER"] for u in utts.values()]
        ax.hist(wers, bins=30, alpha=0.5,
                label=f"{label} (corpus {corpus:.2f})")
    ax.set_xlabel("per-utterance WER")
    ax.set_ylabel("count")
    ax.legend(fontsize=8)
    fig.tight_layout()
    written = []
    for fmt in formats:
        out = os.path.join(output_dir, f"wer_hist.{fmt}")
        fig.savefig(out, dpi=150)
        written.append(out)
    plt.close(fig)

    # pairwise scatter when exactly two reports are given
    if len(parsed) == 2:
        (la, (_, ua)), (lb, (_, ub)) = parsed.items()
        common = sorted(set(ua) & set(ub))
        if common:
            fig, ax = plt.subplots(figsize=(5, 5))
            xs = [ua[k]["WER"] for k in common]
            ys = [ub[k]["WER"] for k in common]
            ax.scatter(xs, ys, s=6, alpha=0.5)
            lim = max(max(xs), max(ys)) * 1.05 + 1
            ax.plot([0, lim], [0, lim], "k--", linewidth=0.8)
            ax.set_xlabel(f"{la} WER")
            ax.set_ylabel(f"{lb} WER")
            fig.tight_layout()
            for fmt in formats:
                out = os.path.join(output_dir, f"wer_scatter.{fmt}")
                fig.savefig(out, dpi=150)
                written.append(out)
            plt.close(fig)

    # worst utterances report
    report = os.path.join(output_dir, "worst_utterances.txt")
    with open(report, "w", encoding="utf-8") as f:
        for label, (_, utts) in parsed.items():
            ranked = sorted(utts.items(), key=lambda kv: -kv[1]["WER"])
            print(f"== {label}: top-{top_k} worst ==", file=f)
            for key, d in ranked[:top_k]:
                print(f"{d['WER']:7.2f}  {key}  "
                      f"({d['insertions']}I {d['deletions']}D "
                      f"{d['substitutions']}S / {d['num_ref_tokens']})",
                      file=f)
    written.append(report)
    return written


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("wer_files", nargs="+")
    parser.add_argument("--output_dir", default="wer_plots")
    parser.add_argument("--formats", nargs="+", default=["jpg", "pdf"])
    parser.add_argument("--labels", nargs="+", default=None)
    parser.add_argument("--top_k", type=int, default=20)
    args = parser.parse_args()
    files = plot_wer(args.wer_files, args.output_dir, args.formats,
                     args.labels, args.top_k)
    print(f"Wrote {len(files)} outputs to {args.output_dir}")
