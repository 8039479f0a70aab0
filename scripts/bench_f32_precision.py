"""Cost of f32 parity precision: Precision.HIGHEST vs XLA's default.

Since r3, f32 convs request ``lax.Precision.HIGHEST`` (true f32 passes;
docs/NUMERICS.md) because XLA:TPU's default executes f32 convs with bf16
passes and that measurably stalls DIP convergence on hard problems. The CLI
default is ``dtype=float32``, so users of the default config pay whatever
HIGHEST costs — this script measures that cost on the 32^3 golden workload
(the f32 parity configuration; the 256x128x128 flagship runs bf16 where the
knob is inert).

DPI_F32_CONV_PRECISION is read at trace time and is not part of the jit
cache key, so each mode runs in its own subprocess.

Usage: python scripts/bench_f32_precision.py [--iters 300] [--platform default]
Writes f32_precision_ab.json at the repo root and prints a JSON summary.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, {root!r})
sys.path.insert(0, os.path.join({root!r}, "scripts"))
import jax
if {platform!r} != "default":
    jax.config.update("jax_platforms", {platform!r})
import golden_3d as g
import deep_prior_interpolation_tpu as dpi

img, mask = g.make_problem(1)
cfg = dpi.Config(datadim="3d", epochs={iters}, loss="mae", lr=1e-3,
                 inputdepth=g.INPUTDEPTH, gain=1.0, upsample="linear",
                 reg_noise_std=0.03, noise_std=0.1, scan_chunk=25)
solver = dpi.DIPSolver(cfg, outchannel=1)
r0 = solver.solve(img, mask, seed=1)       # compile + warm run
t0 = time.time()
r1 = solver.solve(img, mask, seed=2)       # steady state (jit cache hit)
elapsed = time.time() - t0
print(json.dumps({{
    "mode": os.environ.get("DPI_F32_CONV_PRECISION", "highest"),
    "sec_per_1000_iters": round(elapsed / {iters} * 1000.0, 2),
    "best_snr_seed2_db": round(float(np.max(r1.history.snr)), 2),
    "iters": {iters},
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--platform", type=str, default="default")
    ap.add_argument("--out", type=str,
                    default=os.path.join(ROOT, "f32_precision_ab.json"))
    args = ap.parse_args()

    child = CHILD.format(root=ROOT, iters=args.iters,
                         platform=args.platform)
    rows = []
    for mode in ("highest", "default"):
        env = dict(os.environ, DPI_F32_CONV_PRECISION=mode)
        out = subprocess.run([sys.executable, "-c", child], env=env,
                             capture_output=True, text=True)
        if out.returncode != 0:
            sys.exit(f"mode={mode} failed:\n{out.stderr[-2000:]}")
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(rows[-1], flush=True)

    hi, de = rows
    art = {
        "workload": "32^3 golden problem 1, f32, 300 iters steady-state "
                    "(compile excluded), single chip",
        "platform": args.platform,
        "rows": rows,
        "highest_over_default_slowdown":
            round(hi["sec_per_1000_iters"] / de["sec_per_1000_iters"], 3),
    }
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=2)
    print(json.dumps(art["highest_over_default_slowdown"]))


if __name__ == "__main__":
    main()
