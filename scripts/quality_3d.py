"""Refresh quality_3d.json on the SHIPPED flagship config (VERDICT r2 weak
#6: the round-1 artifact recorded the old remat_levels=3 / 1.46x config).

Runs the poc_3D workload — (256,128,128,1) synthetic hyperbolic events, 66%
trace decimation, gain 40, MulResUnet3D, inputdepth 64, trilinear, L1, Adam
1e-3 (proof_of_concept_3D.ipynb cell 4) — through the bench-default fast
path (bfloat16, phase_space levels 3, no remat, materialised input)
and records endpoint SNR/pcorr/wall-clock.

Usage: python scripts/quality_3d.py [--iters 2000] [--out quality_3d.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_hyperbolic  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--out", type=str, default="quality_3d.json")
    ap.add_argument("--shape", type=str, default="256,128,128")
    args = ap.parse_args()

    import jax
    import deep_prior_interpolation_tpu as dpi
    from deep_prior_interpolation_tpu.ops import pcorr, snr

    nt, nx, ny = (int(v) for v in args.shape.split(","))
    vol = synth_hyperbolic(nt, nx, ny)
    rng = np.random.RandomState(1)
    mask = np.repeat((rng.rand(1, nx, ny) > 0.66).astype(np.float32), nt, 0)
    img = (vol * 40.0)[..., None]
    msk = mask[..., None]

    cfg = dpi.Config(datadim="3d", epochs=args.iters, loss="mae", lr=1e-3,
                     inputdepth=64, upsample="linear", gain=40.0,
                     reg_noise_std=0.03, noise_std=0.1, scan_chunk=25,
                     dtype="bfloat16", remat=False,
                     phase_space=True, phase_levels=3, virtual_input=False)
    solver = dpi.DIPSolver(cfg, outchannel=1)
    t0 = time.time()
    res = solver.solve(img, msk, seed=0, verbose=True)
    elapsed = time.time() - t0

    out = res.out_best
    final_snr = float(snr(out, img))
    final_pc = float(pcorr(out, img))
    result = {
        "workload": "poc_3D config: (256,128,128,1) patch, MulResUnet3D, "
                    "inputdepth 64, gain 40, trilinear, L1, Adam 1e-3, 66% "
                    "trace decimation",
        "data": "synthetic hyperbolic events (hyperbolic3d absent from "
                "reference tree)",
        "ours": {
            "snr_db": round(final_snr, 2),
            "pcorr": round(final_pc, 4),
            "best_traj_snr_db": round(float(np.max(res.history.snr)), 2),
            "iters": int(res.iters_run),
            "elapsed_s": round(elapsed, 1),
            "hardware": f"TPU ({jax.default_backend()}), 1 chip",
            "config": "bfloat16, phase_space levels 3, no remat, "
                      "materialised input (bench r3 defaults)",
        },
        "reference_notebook": {
            "snr_db": 16.69, "pcorr": 0.9893, "iters": 3000,
            "elapsed": "1:52:19", "hardware": "Tesla V100-PCIE-16GB",
        },
        "note": "different data content (synthetic vs the missing "
                "hyperbolic3d), same shapes/config; endpoint quality of the "
                "config users actually get (the shipped fast path)",
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"\nsaved {args.out}: SNR {final_snr:.2f} dB, pcorr {final_pc:.4f},"
          f" {elapsed:.0f}s for {res.iters_run} iters")


if __name__ == "__main__":
    main()
