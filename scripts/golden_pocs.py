"""DIP+POCS loop golden vs the reference driver (VERDICT r2 item 5).

The POCS *projection* is pinned number-for-number (tests/test_pocs_golden).
This compares the optimisation LOOP (/root/reference/main_pocs.py:160-254):
a faithful standalone re-creation of the torch driver — fresh reg noise per
iter, masked main loss, reg_data = POCS(out).detach() in the legacy
stacked-(re,im) rfft semantics, adaptive eps — against our solver, in BOTH
adaptive-eps gradient modes:

  * ``attached`` — the reference AS EXECUTED: ``eps.detach()`` at
    main_pocs.py:190 discards its result, so eps = main/reg stays attached
    and eps*reg == main_loss identically as a function of the params. The
    regulariser contributes zero extra gradient direction; total = 2*main.
  * ``stop_grad`` — the published intent (our default): eps is a constant
    each iteration, so the reg term actually pulls the output toward its
    f-k-thresholded projection.

The artifact records best-SNR and the loss/eps/reg traces per mode plus a
plain-DIP control, quantifying exactly what the intent-fix changes.

Usage: python scripts/golden_pocs.py [--iters 300] [--seeds 3]
       [--out golden_pocs.json] [--platform cpu|default] [--skip-reference]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from golden_2d import load_reference_mulresunet  # noqa: E402
from test_pocs_golden import legacy_pocs_apply  # noqa: E402  (numpy oracle)

POCS_ALPHA = 0.1
POCS_THRESH = 5.0


def load_lines():
    from deep_prior_interpolation_tpu.data.bundled import lines_dataset
    img, mask = lines_dataset()
    return img.astype(np.float32), mask.astype(np.float32)


def run_reference(img, mask, iters: int, seed: int = 0,
                  eps_mode: str = "attached") -> dict:
    """main_pocs.py:160-254 re-created standalone (fixing only the
    args.reg_weight crash, SURVEY §2.4 #3; adaptive eps needs no fix to RUN,
    only to regularise)."""
    import torch

    torch.manual_seed(seed)
    m = load_reference_mulresunet()
    net = m.MulResUnet(num_input_channels=64, num_output_channels=1)

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
    h, w = img.shape[:2]
    img_t = torch.from_numpy(img[None].transpose(0, 3, 1, 2)).float()
    mask_t = torch.from_numpy(mask[None].transpose(0, 3, 1, 2)).float()
    coarse_t = img_t * mask_t
    coarse_np = coarse_t.numpy()
    mask_np = mask_t.numpy()

    torch.manual_seed(1000 + seed)
    inp = torch.zeros(1, 64, h, w).normal_() * 0.1
    add_noise = inp.detach().clone()

    loss_fn = torch.nn.L1Loss()
    reg_fn = torch.nn.MSELoss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    num = np.sum(img ** 2)
    best_loss, best_snr = np.inf, -np.inf
    trace = {"loss": [], "df": [], "reg": [], "eps": [], "snr": []}
    t0 = time.time()
    for it in range(iters):
        opt.zero_grad()
        input_ = inp + add_noise.normal_() * 0.03
        out = net(input_)
        main_loss = loss_fn(out * mask_t, coarse_t)
        # POCS(out).detach() — gradients never flow through the projection,
        # so the legacy-semantics numpy oracle is exact here
        proj, _ = legacy_pocs_apply(out.detach().numpy().astype(np.float64),
                                    coarse_np.astype(np.float64),
                                    mask_np.astype(np.float64),
                                    POCS_ALPHA, POCS_THRESH, axes=(2, 3))
        reg_data = torch.from_numpy(proj.astype(np.float32))
        reg_loss = reg_fn(out, reg_data)
        eps = main_loss / reg_loss
        if eps_mode == "stop_grad":
            eps = eps.detach()  # the published intent
        # eps_mode == 'attached': main_pocs.py:190 as executed (no-op detach)
        total = main_loss + eps * reg_loss
        total.backward()
        out_np = out.detach().numpy()[0].transpose(1, 2, 0)
        snr_it = 10 * np.log10(num / np.sum((img - out_np) ** 2))
        best_snr = max(best_snr, snr_it)
        best_loss = min(best_loss, float(total.item()))
        trace["loss"].append(float(total.item()))
        trace["df"].append(float(main_loss.item()))
        trace["reg"].append(float(reg_loss.item()))
        trace["eps"].append(float(eps.item()))
        trace["snr"].append(float(snr_it))
        opt.step()
    return {"best_snr": float(best_snr), "final_loss": best_loss,
            "elapsed": time.time() - t0, "trace": trace}


_SOLVERS: dict = {}


def run_ours(img, mask, iters: int, seed: int, mode: str) -> dict:
    """mode: 'stop_grad' | 'attached' | 'plain' (pocs off, the control)."""
    import deep_prior_interpolation_tpu as dpi

    if mode not in _SOLVERS:
        cfg = dpi.Config(datadim="2d", epochs=iters, loss="mae", lr=1e-3,
                         inputdepth=64, gain=1.0, reg_noise_std=0.03,
                         noise_std=0.1, scan_chunk=50,
                         pocs=mode != "plain",
                         pocs_alpha=POCS_ALPHA, pocs_thresh=POCS_THRESH,
                         pocs_eps_mode=("attached" if mode == "attached"
                                        else "stop_grad"))
        _SOLVERS[mode] = dpi.DIPSolver(cfg, outchannel=1)
    res = _SOLVERS[mode].solve(img, mask, seed=seed)
    out = {"best_snr": float(np.max(res.history.snr)),
           "final_loss": float(min(res.history.loss)),
           "elapsed": res.elapsed,
           "trace": {"loss": [float(v) for v in res.history.loss],
                     "snr": [float(v) for v in res.history.snr]}}
    if mode != "plain":
        out["trace"]["df"] = [float(v) for v in res.history.df]
        out["trace"]["reg"] = [float(v) for v in res.history.reg]
        out["trace"]["eps"] = [float(v) for v in res.history.eps]
    return out


def _stats(runs, key):
    v = np.asarray([r[key] for r in runs], np.float64)
    return {"mean": float(v.mean()), "std": float(v.std()),
            "values": [float(x) for x in v]}


def _summary(runs):
    out = {k: _stats(runs, k) for k in ("best_snr", "final_loss", "elapsed")}
    # keep ONE full trace (seed 0) for plotting/inspection; means otherwise
    out["trace_seed0"] = {k: v[:: max(1, len(v) // 100)]
                          for k, v in runs[0]["trace"].items()}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", type=str, default="golden_pocs.json")
    ap.add_argument("--platform", type=str, default="cpu")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--only", choices=["both", "ours", "reference"],
                    default="both",
                    help="run only one side and merge into --out")
    args = ap.parse_args()

    import jax
    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    do_ours = args.only in ("both", "ours")
    do_ref = args.only in ("both", "reference") and not args.skip_reference

    img, mask = load_lines()
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
                                "L1 main + MSE reg, POCS alpha "
                                f"{POCS_ALPHA} thresh {POCS_THRESH}%, Adam "
                                "1e-3 (main_pocs.py:160-254 defaults)"})

    if do_ours:
        for mode in ("stop_grad", "attached", "plain"):
            runs = []
            for s in range(args.seeds):
                runs.append(run_ours(img, mask, args.iters, s, mode))
                print(f"ours[{mode}] seed {s}: best-SNR "
                      f"{runs[-1]['best_snr']:.2f} dB "
                      f"({runs[-1]['elapsed']:.0f}s)", flush=True)
            results[f"ours_{mode}"] = _summary(runs)
        results["platform_ours"] = jax.default_backend()

    if do_ref:
        for mode in ("attached", "stop_grad"):
            runs = []
            for s in range(args.seeds):
                runs.append(run_reference(img, mask, args.iters, s, mode))
                print(f"torch[{mode}] seed {s}: best-SNR "
                      f"{runs[-1]['best_snr']:.2f} dB "
                      f"({runs[-1]['elapsed']:.0f}s)", flush=True)
            results[f"reference_{mode}"] = _summary(runs)

    if "ours_stop_grad" in results and "reference_stop_grad" in results:
        go, gr = (results["ours_stop_grad"]["best_snr"]["mean"],
                  results["reference_stop_grad"]["best_snr"]["mean"])
        results["stop_grad_gap_db"] = go - gr
        ga, gra = (results["ours_attached"]["best_snr"]["mean"],
                   results["reference_attached"]["best_snr"]["mean"])
        results["attached_gap_db"] = ga - gra
        # the quantified intent-fix delta, per implementation
        results["intent_fix_delta_db"] = {
            "ours": results["ours_stop_grad"]["best_snr"]["mean"]
            - results["ours_attached"]["best_snr"]["mean"],
            "reference": results["reference_stop_grad"]["best_snr"]["mean"]
            - results["reference_attached"]["best_snr"]["mean"],
        }
        print(f"gap stop_grad {results['stop_grad_gap_db']:+.2f} dB, "
              f"attached {results['attached_gap_db']:+.2f} dB, "
              f"intent-fix delta ours "
              f"{results['intent_fix_delta_db']['ours']:+.2f} / ref "
              f"{results['intent_fix_delta_db']['reference']:+.2f} dB")

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
