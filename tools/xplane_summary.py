#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace of the production step:
device-time breakdown by HLO op category + top individual ops.

Companion to ``tools/profile_step.py --trace DIR`` — turns the raw
``*.xplane.pb`` into the "where do the milliseconds go" table
(reports/perf_r3.md 4d) without needing a working tensorboard profile
plugin (this image's plugin/TF combination cannot convert xplanes, so
this parses the proto directly).

Usage: python tools/xplane_summary.py profiles/r3_trace [--steps 5]
"""

import argparse
import collections
import glob
import json
import os
import re
import sys


def main():
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=5,
                    help="train steps inside the traced call "
                         "(profile_step scans K=5)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(sorted(paths)[-1], "rb").read())
    planes = [p for p in sp.planes if p.name.startswith("/device:")
              and any(l.events for l in p.lines)]
    if not planes:
        sys.exit("no device plane with events")
    plane = planes[0]

    stat_ids = {m.name: i for i, m in plane.stat_metadata.items()}
    dur_id = stat_ids.get("device_duration_ps")

    by_cat = collections.Counter()
    by_op = collections.Counter()
    total_ps = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            name = plane.event_metadata[e.metadata_id].name
            dur = e.duration_ps
            for s in e.stats:
                if s.metadata_id == dur_id:
                    dur = s.uint64_value
            m = re.match(r"%([a-zA-Z0-9_-]+?)[.\s]", name)
            cat = m.group(1).rstrip("0123456789-") if m else "other"
            cat = cat.rstrip(".")
            by_cat[cat] += dur
            by_op[name.split(" = ")[0]] += dur
            total_ps += dur

    ms = 1e-9
    per_step = args.steps
    report = {
        "device": plane.name,
        "total_device_ms_per_step": round(total_ps * ms / per_step, 3),
        "by_category_ms_per_step": {
            k: round(v * ms / per_step, 3)
            for k, v in by_cat.most_common()},
        "top_ops_ms_per_step": {
            k[:80]: round(v * ms / per_step, 3)
            for k, v in by_op.most_common(args.top)},
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
