#!/usr/bin/env python
"""Manifest statistics: duration/overlap/speaker histograms.

Equivalent of the reference ``tools/plot_data.py``: reads the prepared
JSON manifests (``prepare_librispeechmix`` output) and plots duration,
delay/overlap-ratio and target-length distributions, plus summary stats.
"""

import argparse
import json
import os


def load_manifest(path):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def manifest_stats(entries):
    import numpy as np
    durations = np.asarray([e["duration"] for e in entries.values()])
    target_durs = np.asarray([
        e["durations"][e["target_speaker_idx"]] for e in entries.values()])
    overlaps = []
    for e in entries.values():
        tgt = e["target_speaker_idx"]
        t0 = e["delays"][tgt]
        t1 = t0 + e["durations"][tgt]
        overlap = 0.0
        for i, (d, dur) in enumerate(zip(e["delays"], e["durations"])):
            if i == tgt:
                continue
            overlap = max(overlap,
                          max(0.0, min(t1, d + dur) - max(t0, d)))
        overlaps.append(overlap / max(e["durations"][tgt], 1e-9))
    return {
        "n": len(entries),
        "durations": durations,
        "target_durations": target_durs,
        "overlap_ratios": np.asarray(overlaps),
        "total_hours": float(durations.sum() / 3600),
    }


def plot_data(manifests, output_dir="data_plots", formats=("jpg",)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    written = []
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for path in manifests:
        stats = manifest_stats(load_manifest(path))
        label = (f"{os.path.basename(path)} (n={stats['n']}, "
                 f"{stats['total_hours']:.1f}h)")
        axes[0].hist(stats["durations"], bins=40, alpha=0.5, label=label)
        axes[1].hist(stats["target_durations"], bins=40, alpha=0.5)
        axes[2].hist(stats["overlap_ratios"], bins=40, alpha=0.5)
    axes[0].set_xlabel("mixture duration (s)")
    axes[1].set_xlabel("target duration (s)")
    axes[2].set_xlabel("overlap ratio")
    for ax in axes:
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    for fmt in formats:
        out = os.path.join(output_dir, f"data_stats.{fmt}")
        fig.savefig(out, dpi=150)
        written.append(out)
    plt.close(fig)
    return written


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("manifests", nargs="+",
                        help="prepared manifest JSON files")
    parser.add_argument("--output_dir", default="data_plots")
    parser.add_argument("--formats", nargs="+", default=["jpg", "pdf"])
    args = parser.parse_args()
    files = plot_data(args.manifests, args.output_dir, args.formats)
    print(f"Wrote {len(files)} plots to {args.output_dir}")
