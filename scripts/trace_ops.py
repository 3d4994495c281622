#!/usr/bin/env python
"""Dump per-op device times from a saved jax.profiler xplane trace,
filtered by a regex — the drill-down companion of profile_unet.py's
bucket summary (same xplane parsing, see profile_unet.py:110-152).

Usage: python scripts/trace_ops.py TRACE_DIR [--match clamp|convert|copy]
       [--top 40] [--steps 16]
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_per_op(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = collections.Counter()
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--match", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()
    per_op = load_per_op(args.trace_dir)
    pat = re.compile(args.match, re.I) if args.match else None
    rows = [(ps, n) for n, ps in per_op.items()
            if pat is None or pat.search(n)]
    rows.sort(reverse=True)
    tot = sum(ps for ps, _ in rows)
    print(f"{len(rows)} ops matching {args.match!r}: "
          f"{tot / 1e9 / args.steps:.3f} ms/step total")
    for ps, n in rows[:args.top]:
        print(f"  {ps / 1e9 / args.steps:7.4f}  {n[:160]}")


if __name__ == "__main__":
    main()
