"""Golden parity check: reference (torch, CPU) vs TPU-native solver on the
bundled lines 2D config (proof_of_concept_2D.ipynb cell 4, the BASELINE.json
PR1 config).

Re-creates the reference optimisation loop standalone (the reference package
cannot be imported wholesale — its utils pull in scikit-image/OpenCV/GPUtil
which are not in this image) by loading only ``architectures.mulresunet``
from /root/reference via an importlib package shim, and reproducing
main.py:141-220 faithfully: xavier(0.02) + BN N(10, 0.2) init
(utils/torch.py:23-58), input noise N(0,1)*0.1, fresh reg noise 0.03/iter,
L1 masked loss, Adam 1e-3, best-loss output tracking.

Acceptance (BASELINE.json): our best-output SNR within 0.5 dB of the
reference at equal iteration counts.

Usage: python scripts/golden_2d.py [--iters 500] [--out golden_2d.json]
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


def load_reference_mulresunet():
    pkg = types.ModuleType("refarch")
    pkg.__path__ = ["/root/reference/architectures"]
    sys.modules.setdefault("refarch", pkg)
    return importlib.import_module("refarch.mulresunet")


def run_reference(img: np.ndarray, mask: np.ndarray, iters: int,
                  seed: int = 0) -> dict:
    import torch

    torch.manual_seed(seed)
    m = load_reference_mulresunet()
    net = m.MulResUnet(num_input_channels=64, num_output_channels=1)

    # init_weights(xavier, 0.02) incl. the BN N(10, 0.2) quirk
    # (utils/torch.py:23-58)
    def init_func(mod):
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
    inp = torch.zeros(1, 64, *img.shape[:-1]).normal_() * 0.1

    loss_fn = torch.nn.L1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    best_loss, best_out = None, None
    t0 = time.time()
    for it in range(iters):
        opt.zero_grad()
        input_ = inp.detach().clone()
        input_ += 0.03 * input_.clone().normal_()  # reg_noise_std
        out = net(input_)
        loss = loss_fn(out * mask_t, img_t * mask_t)
        loss.backward()
        l = loss.item()
        if best_loss is None or l <= best_loss:
            best_loss, best_out = l, out.detach().numpy()
        opt.step()
        if it % 50 == 0:
            print(f"  ref iter {it}: loss {l:.3e}", flush=True)
    elapsed = time.time() - t0

    out_img = best_out[0].transpose(1, 2, 0)
    num = np.sum(img ** 2)
    den = np.sum((img - out_img) ** 2)
    return {"snr": float(10 * np.log10(num / den)),
            "final_loss": best_loss, "elapsed": elapsed}


def run_ours(img: np.ndarray, mask: np.ndarray, iters: int,
             seed: int = 0) -> dict:
    import deep_prior_interpolation_tpu as dpi
    from deep_prior_interpolation_tpu.ops import snr as snr_fn

    cfg = dpi.Config(datadim="2d", epochs=iters, loss="mae", lr=1e-3,
                     inputdepth=64, gain=1.0, reg_noise_std=0.03,
                     noise_std=0.1, scan_chunk=50)
    solver = dpi.DIPSolver(cfg, outchannel=1)
    res = solver.solve(img, mask, seed=seed)
    return {"snr": float(snr_fn(res.out_best, img)),
            "final_loss": float(min(res.history.loss)),
            "elapsed": res.elapsed}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--out", type=str, default="golden_2d.json")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    from deep_prior_interpolation_tpu.data import lines_dataset
    img, mask = lines_dataset()

    results = {"iters": args.iters, "workload": "lines 170x100, MulResUnet2D,"
               " inputdepth 64, L1, Adam 1e-3, gain 1 (poc_2D cell 4)",
               "note": "SNR-at-fixed-iteration on this config has multi-dB "
               "seed variance (measured: ours seed0 5.91 dB, seed1 0.88 dB; "
               "the reference notebook itself ends at -0.59 dB after 3000 "
               "iters) — the DIP trajectory overfits past its SNR peak, so "
               "sub-dB gaps at one seed are within noise."}
    print("running TPU-native solver...", flush=True)
    results["ours"] = run_ours(img, mask, args.iters)
    print(f"  ours: SNR {results['ours']['snr']:.2f} dB in "
          f"{results['ours']['elapsed']:.0f}s", flush=True)
    if not args.skip_reference:
        print("running reference (torch CPU)...", flush=True)
        results["reference"] = run_reference(img, mask, args.iters)
        print(f"  reference: SNR {results['reference']['snr']:.2f} dB in "
              f"{results['reference']['elapsed']:.0f}s", flush=True)
        results["snr_gap_db"] = results["ours"]["snr"] - results["reference"]["snr"]
        print(f"SNR gap (ours - ref): {results['snr_gap_db']:+.2f} dB")

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
