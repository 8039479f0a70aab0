"""Profile the flagship 3D step on the real TPU and print a per-op summary.

Runs the same workload as bench.py, traces the timed steady-state chunks
with jax.profiler, then parses the xplane protobuf directly (the installed
tensorboard_plugin_profile converter is incompatible with this TF build)
and prints the top device ops by total time — the ground truth for where
the s/iter actually goes (MXU convs vs elementwise/norm vs RNG vs copies).

Usage: python scripts/profile_flagship.py [--outdir /tmp/prof] [--top 40]
       python scripts/profile_flagship.py --parse-only /tmp/prof
Env: same BENCH_* knobs as bench.py. The TF tsl xplane proto parses fine
with the default C++ protobuf backend (fast — ~8 s for a 700 MB trace);
only the tensorboard_plugin_profile protos need the pure-python fallback,
and we do not use them.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict


def _classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n:
        return "conv (MXU)"
    if "dot" in n:
        return "matmul"
    if "threefry" in n or "rng" in n or "random" in n:
        return "rng"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if n.startswith("%copy") or "transpose" in n or "bitcast" in n:
        return "layout copies"
    if "reduce" in n:
        return "reductions"
    if "fusion" in n:
        return "fusions (elementwise/norm/pad)"
    if "pad" in n or "slice" in n or "concatenate" in n or "reshape" in n:
        return "pad/slice/concat"
    return "other"


def summarize(root: str, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    planes = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        sys.exit(f"no .xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as fh:
        xs.ParseFromString(fh.read())

    dev_planes = [p for p in xs.planes
                  if "TPU" in p.name or "device" in p.name.lower()]
    if not dev_planes:  # CPU fallback (smoke tests): XLA ops on the host plane
        dev_planes = [p for p in xs.planes if p.name == "/host:CPU"]
    if not dev_planes:
        print("available planes:", [p.name for p in xs.planes])
        sys.exit("no device plane in trace")

    agg: dict = defaultdict(float)
    cat: dict = defaultdict(float)
    total = 0.0
    for p in dev_planes:
        md = p.event_metadata
        for line in p.lines:
            # the "XLA Ops" line carries HLO-level events; other lines
            # (Steps, XLA Modules) are parent spans and would double-count
            if line.name not in ("XLA Ops", ""):
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name
                if name.startswith("%while"):  # scan-body parent span
                    continue
                dur = ev.duration_ps / 1e9  # -> ms
                agg[name] += dur
                cat[_classify(name)] += dur
                total += dur

    print(f"device planes: {[p.name for p in dev_planes]}")
    print(f"total device op time: {total:.1f} ms\n")
    print("by category:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {100 * v / total:6.2f}%  {v:10.1f} ms  {k}")
    print(f"\ntop {top} ops:")
    for name, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {100 * v / total:6.2f}%  {v:10.1f} ms  {name[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/prof")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", default=None,
                    help="skip the run; parse this trace dir")
    args = ap.parse_args()

    if args.parse_only is None:
        os.environ.setdefault("BENCH_ITERS", "25")
        os.environ.setdefault("BENCH_CHUNK", "25")
        import jax
        import importlib

        sys.argv = [sys.argv[0]]
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))  # repo root, for `import bench`
        bench = importlib.import_module("bench")
        with jax.profiler.trace(args.outdir):
            bench.main()
        print(f"trace written under {args.outdir}", flush=True)
        root = args.outdir
    else:
        root = args.parse_only
    summarize(root, args.top)


if __name__ == "__main__":
    main()
