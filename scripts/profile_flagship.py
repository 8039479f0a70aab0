"""Profile the flagship 3D step on the real TPU and print a per-op summary.

Runs the same workload as bench.py, traces the timed steady-state chunks
with jax.profiler, then parses the xplane protobuf directly (the installed
tensorboard_plugin_profile converter is incompatible with this TF build)
and prints the top device ops by total time — the ground truth for where
the s/iter actually goes (MXU convs vs elementwise/norm vs RNG vs copies).

Usage: python scripts/profile_flagship.py [--outdir /tmp/prof] [--top 40]
       python scripts/profile_flagship.py --parse-only /tmp/prof
Env: same BENCH_* knobs as bench.py. Needs
     PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the proto parse.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n and "fusion" not in n:
        return "conv"
    if "dot" in n:
        return "matmul"
    if "threefry" in n or "rng" in n or "random" in n:
        return "rng"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n or "add" in n or "multiply" in n or "select" in n:
        return "elementwise/fused"
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
            # XLA op lines carry the HLO-level events; step lines etc. would
            # double-count, so keep only op/XLA lines
            if not re.search(r"xla|ops|stream", line.name, re.I) \
                    and line.name:
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name
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
