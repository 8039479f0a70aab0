"""Golden parity check: reference (torch, CPU) vs TPU-native solver on the
bundled lines 2D config (proof_of_concept_2D.ipynb cell 4, the BASELINE.json
PR1 config), over MULTIPLE SEEDS.

Re-creates the reference optimisation loop standalone (the reference package
cannot be imported wholesale — its utils pull in scikit-image/OpenCV/GPUtil
which are not in this image) by loading only ``architectures.mulresunet``
from /root/reference via an importlib package shim, and reproducing
main.py:141-220 faithfully: xavier(0.02) + BN N(10, 0.2) init
(utils/torch.py:23-58), input noise N(0,1)*0.1, fresh reg noise 0.03/iter,
L1 masked loss, Adam 1e-3, best-loss output tracking.

DIP SNR-at-fixed-iteration has multi-dB seed variance on this config, so a
single draw cannot support a 0.5 dB acceptance; instead both codes run
``--seeds`` independent seeds and the comparison is on mean best-SNR (max
over the metric trajectory — both codes track best-loss, which peaks before
SNR) +- 1 sigma. Acceptance: means within 0.5 dB OR overlapping 1-sigma
intervals.

Usage: python scripts/golden_2d.py [--iters 500] [--seeds 5]
       [--out golden_2d.json] [--skip-reference] [--platform cpu|default]
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

    num = np.sum(img ** 2)
    best_loss, best_out, best_snr = None, None, -np.inf
    t0 = time.time()
    for it in range(iters):
        opt.zero_grad()
        input_ = inp.detach().clone()
        input_ += 0.03 * input_.clone().normal_()  # reg_noise_std
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

    if _SOLVER is None:  # one solver for all seeds: the jitted scan is reused
        cfg = dpi.Config(datadim="2d", epochs=iters, loss="mae", lr=1e-3,
                         inputdepth=64, gain=1.0, reg_noise_std=0.03,
                         noise_std=0.1, scan_chunk=50)
        _SOLVER = dpi.DIPSolver(cfg, outchannel=1)
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
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", type=str, default="golden_2d.json")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--only", choices=["both", "ours", "reference"],
                    default="both",
                    help="run only one side and merge into --out")
    ap.add_argument("--platform", type=str, default="cpu",
                    choices=["cpu", "default"],
                    help="backend for OUR solver (cpu keeps the comparison "
                    "hermetic and off the shared TPU relay)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    do_ours = args.only in ("both", "ours")
    do_ref = args.only in ("both", "reference") and not args.skip_reference

    from deep_prior_interpolation_tpu.data import lines_dataset
    img, mask = lines_dataset()

    results = {}
    if os.path.exists(args.out) and args.only != "both":
        with open(args.out) as fh:
            prev = json.load(fh)
        if prev.get("iters") == args.iters and prev.get("seeds") == args.seeds:
            results = prev
        else:
            print(f"NOT merging {args.out}: iters/seeds differ", flush=True)
    results.update({"iters": args.iters, "seeds": args.seeds,
                    "workload": "lines 170x100, MulResUnet2D, inputdepth 64, "
                    "L1, Adam 1e-3, gain 1 (poc_2D cell 4)",
                    "metric": "best_snr = max SNR over the trajectory; mean "
                    "+- std over seeds (single-seed SNR has multi-dB "
                    "variance)"})
    results.setdefault("platforms", {})

    if do_ours:
        print(f"running TPU-native solver x{args.seeds} seeds...", flush=True)
        ours = [run_ours(img, mask, args.iters, seed=s)
                for s in range(args.seeds)]
        results["ours"] = {k: _stats(ours, k)
                           for k in ("snr", "best_snr", "elapsed")}
        results["platforms"]["ours"] = jax.default_backend()
        print(f"  ours best-SNR: {results['ours']['best_snr']['mean']:.2f} "
              f"+- {results['ours']['best_snr']['std']:.2f} dB", flush=True)

    if do_ref:
        print(f"running reference (torch CPU) x{args.seeds} seeds...",
              flush=True)
        ref = [run_reference(img, mask, args.iters, seed=s)
               for s in range(args.seeds)]
        results["reference"] = {k: _stats(ref, k)
                                for k in ("snr", "best_snr", "elapsed")}
        results["platforms"]["reference"] = "cpu (torch)"
        print(f"  ref  best-SNR: {results['reference']['best_snr']['mean']:.2f} "
              f"+- {results['reference']['best_snr']['std']:.2f} dB", flush=True)

    if "ours" in results and "reference" in results:
        mo, so = (results["ours"]["best_snr"]["mean"],
                  results["ours"]["best_snr"]["std"])
        mr, sr = (results["reference"]["best_snr"]["mean"],
                  results["reference"]["best_snr"]["std"])
        results["best_snr_gap_db"] = mo - mr
        # means within 0.5 dB OR overlapping 1-sigma intervals at n >= 5
        # (the old sigma-sum clause accepted multi-dB gaps; removed)
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
