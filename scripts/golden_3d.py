"""Golden parity check for the 3D path: reference MulResUnet3D (torch, CPU)
vs our solver at a CPU-feasible shape.

Pins the 3D semantics the 2D golden cannot see — the 3D norm-ordering quirks
(extra BN after the stride-2 down conv, mulresunet.py:225-227), trilinear
upsampling, the 3x3 output conv (mulresunet.py:252 — 2D uses 1x1) and the 3D
init statistics — by comparing, over several seeds:

  1. init statistics: per-conv-kernel weight stds (xavier gain 0.02) and the
     Norm scale distribution (the N(10, 10*gain) quirk, utils/torch.py:52);
  2. forward-pass output scale at init on a shared input;
  3. the DIP SNR trajectory (best-SNR mean +- std, as in golden_2d).

Workload: synthetic hyperbolic events (the reference's hyperbolic3d dataset
is absent from its tree, SURVEY §2.1 #23) at (32,32,32), 60% traces dropped,
amplitude x40 to mirror the poc_3D gain regime, MulResUnet3D defaults with
trilinear upsampling, L1, Adam 1e-3 (proof_of_concept_3D.ipynb cell 4,
shrunk).

Usage: python scripts/golden_3d.py [--iters 200] [--seeds 3]
       [--out golden_3d.json] [--skip-reference]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from golden_2d import load_reference_mulresunet  # noqa: E402  (shim loader)

SHAPE = (32, 32, 32)
GAIN = 40.0
INPUTDEPTH = 64


def make_problem(seed: int = 0):
    from deep_prior_interpolation_tpu.data import hyperbolic_events

    img = hyperbolic_events(*SHAPE, seed=seed).astype(np.float32) * GAIN
    rng = np.random.RandomState(100 + seed)
    keep = (rng.rand(1, SHAPE[1], SHAPE[2]) > 0.6).astype(np.float32)
    mask = np.broadcast_to(keep, SHAPE).copy()
    return img[..., None], mask[..., None]


def _torch_net(seed: int):
    import torch

    torch.manual_seed(seed)
    m = load_reference_mulresunet()
    net = m.MulResUnet3D(num_input_channels=INPUTDEPTH,
                         num_output_channels=1, upsample_mode="trilinear")

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
    return net


def reference_stats(seed: int = 0) -> dict:
    import torch

    net = _torch_net(seed)
    conv_stds, bn_scales = [], []
    for mod in net.modules():
        cname = mod.__class__.__name__
        if "Conv" in cname and hasattr(mod, "weight"):
            conv_stds.append(float(mod.weight.data.std()))
        elif "BatchNorm" in cname:
            bn_scales.extend(mod.weight.data.reshape(-1).tolist())
    torch.manual_seed(1000 + seed)
    inp = torch.zeros(1, INPUTDEPTH, *SHAPE).normal_() * 0.1
    with torch.no_grad():
        out = net(inp)
    return {"conv_std_mean": float(np.mean(conv_stds)),
            "n_convs": len(conv_stds),
            "bn_scale_mean": float(np.mean(bn_scales)),
            "bn_scale_std": float(np.std(bn_scales)),
            "fwd_out_std": float(out.numpy().std())}


def ours_stats(seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.models import get_net, init_weights

    cfg = Config(datadim="3d", inputdepth=INPUTDEPTH, upsample="linear")
    model = get_net(cfg, outchannel=1)
    key = jax.random.PRNGKey(seed)
    k_init, k_w, k_fwd = jax.random.split(key, 3)
    dummy = jnp.zeros((1,) + SHAPE + (INPUTDEPTH,))
    params = model.init({"params": k_init}, dummy)["params"]
    params = init_weights(params, k_w, cfg.inittype, cfg.initgain)

    conv_stds, bn_scales = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = jax.tree_util.keystr(path)
        if leaf.ndim == 5:
            conv_stds.append(float(jnp.std(leaf)))
        elif "scale" in name:
            bn_scales.extend(np.asarray(leaf).reshape(-1).tolist())
    inp = jax.random.normal(k_fwd, dummy.shape) * 0.1
    out = model.apply({"params": params}, inp)
    return {"conv_std_mean": float(np.mean(conv_stds)),
            "n_convs": len(conv_stds),
            "bn_scale_mean": float(np.mean(bn_scales)),
            "bn_scale_std": float(np.std(bn_scales)),
            "fwd_out_std": float(np.asarray(out, np.float32).std())}


def run_reference(img, mask, iters: int, seed: int = 0) -> dict:
    import torch

    net = _torch_net(seed)
    img_t = torch.from_numpy(img[None].transpose(0, 4, 1, 2, 3)).float()
    mask_t = torch.from_numpy(mask[None].transpose(0, 4, 1, 2, 3)).float()
    torch.manual_seed(1000 + seed)
    inp = torch.zeros(1, INPUTDEPTH, *SHAPE).normal_() * 0.1

    loss_fn = torch.nn.L1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    num = np.sum(img ** 2)
    best_loss, best_snr = None, -np.inf
    t0 = time.time()
    for it in range(iters):
        opt.zero_grad()
        input_ = inp.detach().clone()
        input_ += 0.03 * input_.clone().normal_()
        out = net(input_)
        loss = loss_fn(out * mask_t, img_t * mask_t)
        loss.backward()
        l = loss.item()
        out_np = out.detach().numpy()[0].transpose(1, 2, 3, 0)
        snr_it = 10 * np.log10(num / np.sum((img - out_np) ** 2))
        best_snr = max(best_snr, snr_it)
        if best_loss is None or l <= best_loss:
            best_loss = l
        opt.step()
    return {"best_snr": float(best_snr), "final_loss": best_loss,
            "elapsed": time.time() - t0}


_SOLVER = None


def run_ours(img, mask, iters: int, seed: int = 0) -> dict:
    global _SOLVER
    import deep_prior_interpolation_tpu as dpi

    if _SOLVER is None:  # one solver for all seeds: the jitted scan is reused
        cfg = dpi.Config(datadim="3d", epochs=iters, loss="mae", lr=1e-3,
                         inputdepth=INPUTDEPTH, gain=1.0, upsample="linear",
                         reg_noise_std=0.03, noise_std=0.1, scan_chunk=25)
        _SOLVER = dpi.DIPSolver(cfg, outchannel=1)
    res = _SOLVER.solve(img, mask, seed=seed)
    return {"best_snr": float(np.max(res.history.snr)),
            "final_loss": float(min(res.history.loss)),
            "elapsed": res.elapsed}


def _stats(runs, key):
    v = np.asarray([r[key] for r in runs], np.float64)
    return {"mean": float(v.mean()), "std": float(v.std()),
            "values": [float(x) for x in v]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", type=str, default="golden_3d.json")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--only", choices=["both", "ours", "reference"],
                    default="both",
                    help="run only one side and merge into --out (lets the "
                         "torch side run on the 1-vCPU host while the TPU "
                         "is busy, and ours on the TPU later)")
    ap.add_argument("--platform", type=str, default="cpu",
                    help="'cpu' pins our side off the TPU relay (hermetic); "
                         "'default' keeps the process backend (TPU under "
                         "axon) — the torch side always runs on CPU")
    args = ap.parse_args()

    import jax
    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    do_ours = args.only in ("both", "ours")
    do_ref = args.only in ("both", "reference") and not args.skip_reference

    results = {}
    if os.path.exists(args.out) and args.only != "both":
        with open(args.out) as fh:
            prev = json.load(fh)
        if prev.get("iters") == args.iters and prev.get("seeds") == args.seeds:
            results = prev  # merge the other side
        else:
            print(f"NOT merging {args.out}: iters/seeds differ", flush=True)
    results.update({"iters": args.iters, "seeds": args.seeds,
                    "workload": f"hyperbolic events {SHAPE}, 60% traces "
                    f"dropped, gain {GAIN}, MulResUnet3D defaults + "
                    "trilinear, L1, Adam 1e-3 (poc_3D cell 4 shrunk)"})
    results.setdefault("platforms", {})

    print("init/forward statistics...", flush=True)
    if do_ours:
        results["init_ours"] = ours_stats(0)
        print(f"  ours: {results['init_ours']}", flush=True)
    if do_ref:
        results["init_reference"] = reference_stats(0)
        print(f"  ref : {results['init_reference']}", flush=True)
    if "init_ours" in results and "init_reference" in results:
        ro, rr = results["init_ours"], results["init_reference"]
        results["init_checks"] = {
            "conv_std_ratio": ro["conv_std_mean"] / rr["conv_std_mean"],
            "bn_scale_mean_gap": ro["bn_scale_mean"] - rr["bn_scale_mean"],
            "fwd_out_std_ratio": ro["fwd_out_std"] / rr["fwd_out_std"],
        }
        print(f"  checks: {results['init_checks']}", flush=True)

    if do_ours:
        print(f"running TPU-native solver x{args.seeds} seeds...", flush=True)
        ours = []
        for s in range(args.seeds):
            img, mask = make_problem(s)
            ours.append(run_ours(img, mask, args.iters, seed=s))
            print(f"  seed {s}: best-SNR {ours[-1]['best_snr']:.2f} dB "
                  f"({ours[-1]['elapsed']:.0f}s)", flush=True)
        results["ours"] = {k: _stats(ours, k) for k in ("best_snr", "elapsed")}
        results["platforms"]["ours"] = jax.default_backend()

    if do_ref:
        print(f"running reference (torch CPU) x{args.seeds} seeds...",
              flush=True)
        ref = []
        for s in range(args.seeds):
            img, mask = make_problem(s)
            ref.append(run_reference(img, mask, args.iters, seed=s))
            print(f"  seed {s}: best-SNR {ref[-1]['best_snr']:.2f} dB "
                  f"({ref[-1]['elapsed']:.0f}s)", flush=True)
        results["reference"] = {k: _stats(ref, k)
                                for k in ("best_snr", "elapsed")}
        results["platforms"]["reference"] = "cpu (torch)"

    if "ours" in results and "reference" in results:
        mo, so = (results["ours"]["best_snr"]["mean"],
                  results["ours"]["best_snr"]["std"])
        mr, sr = (results["reference"]["best_snr"]["mean"],
                  results["reference"]["best_snr"]["std"])
        results["best_snr_gap_db"] = mo - mr
        # Seeds are PAIRED problems (make_problem(s) gives both sides the
        # same data + mask realisation), so also report the per-seed paired
        # differences — far tighter than the cross-seed sigmas, which are
        # dominated by problem difficulty, not implementation.
        vo = results["ours"]["best_snr"]["values"]
        vr = results["reference"]["best_snr"]["values"]
        if len(vo) == len(vr):
            diffs = [a - b for a, b in zip(vo, vr)]
            n = len(diffs)
            dm = sum(diffs) / n
            dsd = (sum((d - dm) ** 2 for d in diffs) / max(n - 1, 1)) ** 0.5
            results["paired"] = {"diffs_db": diffs, "mean_db": dm,
                                 "std_db": dsd,
                                 "sem_db": dsd / n ** 0.5}
            print(f"paired gap: {dm:+.2f} +- {dsd / n ** 0.5:.2f} dB (sem)")
        # Acceptance: means within 0.5 dB, OR overlapping 1-sigma intervals
        # with n >= 5 seeds. (The round-2 |gap| <= sigma_o + sigma_r clause
        # was vacuous at n=2 — it accepted multi-dB regressions.)
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
