"""Golden parity check for the 2.5D mode: reference (torch, CPU) vs the
TPU-native solver, multi-seed mean best-SNR.

2.5D (reference data.py:8-41 + main.py): a 3D (t, x, y) volume is cut
into imgchannel-thick slabs along the last axis and each slab is the
CHANNEL stack of a 2D network — ``slice="tx"`` (the identity orientation)
gives the 2D net a (t, x) canvas with ny channels, reconstructing the
whole slab jointly across channels. This was the one numerical-
parity mode without a golden artifact (mechanics are covered by
tests/test_25d.py); golden_2d.json / golden_3d*.json cover 2D and 3D.

Both sides run the identical workload: synthetic hyperbolic-events volume
(32, 32, 8), 66% of (x, y) traces dropped (mask constant along t),
MulResUnet 2D inputdepth 64,
xavier(0.02) + BN N(10, 0.2) init, input noise N(0,1)*0.1, fresh reg noise
0.03/iter, masked L1, Adam 1e-3, best-loss tracking — main.py:141-220
semantics, num_output_channels = ny. Ours goes through the REAL pipeline
(extract_patches with datadim="2.5d", slice="tx" -> solver).

Acceptance mirrors golden_2d.py: means within 0.5 dB OR overlapping
1-sigma intervals at >= 5 seeds (single-seed DIP SNR has multi-dB
variance).

Usage: python scripts/golden_25d.py [--iters 300] [--seeds 5]
       [--out golden_25d.json]
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, NX, NY = 32, 32, 8


def load_reference_mulresunet():
    pkg = types.ModuleType("refarch")
    pkg.__path__ = ["/root/reference/architectures"]
    sys.modules.setdefault("refarch", pkg)
    return importlib.import_module("refarch.mulresunet")


def make_workload():
    """(image_hwc, mask_hwc) in the 2.5D channels-last layout our solver
    consumes, via the real pipeline (extract_patches, slice='tx')."""
    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.data import extract_patches
    from deep_prior_interpolation_tpu.data.synthetic import decimated_pair

    vol, mask = decimated_pair(NT, NX, NY, rate=0.66, seed=3)
    cfg = Config(datadim="2.5d", slice="tx", imgchannel=NY, gain=1.0,
                 patch_shape=[NT, NX, NY], patch_stride=[NT, NX, NY])
    patches = extract_patches(cfg, original=vol, corrupted=mask)
    assert len(patches) == 1 and patches[0]["image"].shape == (NT, NX, NY)
    return patches[0]["image"], patches[0]["mask"]


def run_reference(img: np.ndarray, mask: np.ndarray, iters: int,
                  seed: int = 0) -> dict:
    import torch

    torch.manual_seed(seed)
    m = load_reference_mulresunet()
    net = m.MulResUnet(num_input_channels=64, num_output_channels=NY)

    def init_func(mod):  # utils/torch.py:23-58
        cname = mod.__class__.__name__
        if hasattr(mod, "weight") and ("Conv" in cname or "Linear" in cname):
            torch.nn.init.xavier_normal_(mod.weight.data, gain=0.02)
            if getattr(mod, "bias", None) is not None:
                torch.nn.init.constant_(mod.bias.data, 0.0)
        elif "BatchNorm" in cname:
            torch.nn.init.normal_(mod.weight.data, 10.0, 0.2)
            torch.nn.init.constant_(mod.bias.data, 0.0)

    net.apply(init_func)

    img_t = torch.from_numpy(img.transpose(2, 0, 1)).float()[None]
    mask_t = torch.from_numpy(mask.transpose(2, 0, 1)).float()[None]
    inp = torch.zeros(1, 64, NT, NX).normal_() * 0.1

    loss_fn = torch.nn.L1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    num = np.sum(img ** 2)
    best_loss, best_out, best_snr = None, None, -np.inf
    t0 = time.time()
    for _ in range(iters):
        opt.zero_grad()
        input_ = inp.detach().clone()
        input_ += 0.03 * input_.clone().normal_()
        out = net(input_)
        loss = loss_fn(out * mask_t, img_t * mask_t)
        loss.backward()
        l = loss.item()
        out_np = out.detach().numpy()[0].transpose(1, 2, 0)
        snr_it = 10 * np.log10(num / np.sum((img - out_np) ** 2))
        best_snr = max(best_snr, snr_it)
        if best_loss is None or l <= best_loss:
            best_loss, best_out = l, out_np
        opt.step()
    elapsed = time.time() - t0

    den = np.sum((img - best_out) ** 2)
    return {"snr": float(10 * np.log10(num / den)),
            "best_snr": float(best_snr),
            "final_loss": best_loss, "elapsed": elapsed}


_SOLVER = None


def run_ours(img: np.ndarray, mask: np.ndarray, iters: int,
             seed: int = 0) -> dict:
    global _SOLVER
    import deep_prior_interpolation_tpu as dpi
    from deep_prior_interpolation_tpu.ops import snr as snr_fn

    if _SOLVER is None:
        cfg = dpi.Config(datadim="2.5d", slice="tx", imgchannel=NY,
                         epochs=iters, loss="mae", lr=1e-3, inputdepth=64,
                         gain=1.0, reg_noise_std=0.03, noise_std=0.1,
                         scan_chunk=50)
        _SOLVER = dpi.DIPSolver(cfg, outchannel=NY)
    res = _SOLVER.solve(img, mask, seed=seed)
    return {"snr": float(snr_fn(res.out_best, img)),
            "best_snr": float(np.max(res.history.snr)),
            "final_loss": float(min(res.history.loss)),
            "elapsed": res.elapsed}


def _stats(runs: list, key: str) -> dict:
    v = np.asarray([r[key] for r in runs], np.float64)
    return {"mean": float(v.mean()), "std": float(v.std()),
            "values": [float(x) for x in v]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", type=str, default="golden_25d.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    img, mask = make_workload()

    results = {"iters": args.iters, "seeds": args.seeds,
               "workload": f"2.5D slice=tx: hyperbolic events ({NT},{NX},{NY})"
               ", 66% traces dropped, MulResUnet2D inputdepth 64 -> "
               f"{NY} output channels, L1, Adam 1e-3 (data.py:8-41 mode)",
               "metric": "best_snr = max SNR over the trajectory; mean +- "
               "std over seeds"}

    print(f"running TPU-native 2.5D solver x{args.seeds} seeds...", flush=True)
    ours = [run_ours(img, mask, args.iters, seed=s) for s in range(args.seeds)]
    results["ours"] = {k: _stats(ours, k) for k in ("snr", "best_snr", "elapsed")}
    print(f"  ours best-SNR: {results['ours']['best_snr']['mean']:.2f} "
          f"+- {results['ours']['best_snr']['std']:.2f} dB", flush=True)

    print(f"running reference (torch CPU) x{args.seeds} seeds...", flush=True)
    ref = [run_reference(img, mask, args.iters, seed=s)
           for s in range(args.seeds)]
    results["reference"] = {k: _stats(ref, k)
                            for k in ("snr", "best_snr", "elapsed")}
    print(f"  ref  best-SNR: {results['reference']['best_snr']['mean']:.2f} "
          f"+- {results['reference']['best_snr']['std']:.2f} dB", flush=True)

    mo, so = (results["ours"]["best_snr"]["mean"],
              results["ours"]["best_snr"]["std"])
    mr, sr = (results["reference"]["best_snr"]["mean"],
              results["reference"]["best_snr"]["std"])
    results["best_snr_gap_db"] = mo - mr
    overlap = (mo - so <= mr + sr) and (mr - sr <= mo + so)
    results["accept"] = bool(abs(mo - mr) <= 0.5
                             or (args.seeds >= 5 and overlap))
    print(f"best-SNR gap (ours - ref): {mo - mr:+.2f} dB  "
          f"accept={results['accept']}")

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
