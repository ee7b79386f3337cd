#!/usr/bin/env python
"""Plot metric curves from ``train_log.txt`` files.

Equivalent of the reference ``tools/plot_train_log.py``: parses the
one-line-per-epoch format written by ``FileTrainLogger``
("epoch: N, lr: x, steps: s - train loss: y - valid loss: z, valid WER: w")
and plots each metric across one or more experiments for comparison.
"""

import argparse
import os
import re

LINE_ITEM = re.compile(r"([\w ]+): ([-+eE.\d]+|nan|inf)")


def parse_train_log(path):
    """-> dict metric_name -> list of (epoch, value)."""
    metrics = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = dict(LINE_ITEM.findall(line))
            if "epoch" not in items:
                continue
            epoch = float(items.pop("epoch"))
            for key, value in items.items():
                try:
                    metrics.setdefault(key.strip(), []).append(
                        (epoch, float(value)))
                except ValueError:
                    continue
    return metrics


def plot_train_logs(paths, output_dir=None, formats=("jpg",),
                    metrics=None, labels=None, usetex=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parsed = {}
    for i, path in enumerate(paths):
        label = labels[i] if labels else \
            os.path.basename(os.path.dirname(path)) or path
        parsed[label] = parse_train_log(path)

    all_metrics = metrics or sorted(
        {m for logs in parsed.values() for m in logs})
    output_dir = output_dir or "."
    os.makedirs(output_dir, exist_ok=True)
    written = []
    for metric in all_metrics:
        fig, ax = plt.subplots(figsize=(7, 4))
        plotted = False
        for label, logs in parsed.items():
            if metric not in logs:
                continue
            xs, ys = zip(*logs[metric])
            ax.plot(xs, ys, label=label, marker=".", markersize=3)
            plotted = True
        if not plotted:
            plt.close(fig)
            continue
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
        fig.tight_layout()
        safe = metric.replace(" ", "_")
        for fmt in formats:
            out = os.path.join(output_dir, f"{safe}.{fmt}")
            fig.savefig(out, dpi=150)
            written.append(out)
        plt.close(fig)
    return written


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("train_logs", nargs="+",
                        help="one or more train_log.txt paths")
    parser.add_argument("--output_dir", default="train_log_plots")
    parser.add_argument("--formats", nargs="+", default=["jpg", "pdf"])
    parser.add_argument("--metrics", nargs="+", default=None)
    parser.add_argument("--labels", nargs="+", default=None)
    args = parser.parse_args()
    files = plot_train_logs(args.train_logs, args.output_dir,
                            args.formats, args.metrics, args.labels)
    print(f"Wrote {len(files)} plots to {args.output_dir}")
