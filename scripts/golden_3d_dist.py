"""Solver-seed DISTRIBUTION golden for the hard 3D problems.

The 600-iter paired golden (`golden_3d_600.json`) compares ONE solver seed
per problem per side. A follow-up variance probe (ours, CPU f32, problem 7,
150 iters, solver seeds 100/101/102) measured best-SNR 6.3 / 14.6 / 18.9 dB
— a ~6 dB sigma across solver seeds on hard problems, which makes
single-sample paired differences (the -7..-9 dB "hard seed gap")
statistically uninterpretable: each side's number is one draw from a wide
distribution. This script builds the distributions: for each hard problem it
runs N solver seeds per side and reports per-problem means.

Sides (run separately, results merge into one artifact):
  --side torch               the reference loop (torch CPU, true f32)
                             [/root/reference/main.py:141-193 semantics]
  --side ours --label L      our solver; the label records the platform +
                             precision variant, e.g. ours_tpu_highest,
                             ours_tpu_defaultprec (DPI_F32_CONV_PRECISION=
                             default), ours_cpu_f32

Usage:
  python scripts/golden_3d_dist.py --side torch --problems 1,6,7 --nseeds 4
  DPI_F32_CONV_PRECISION=default python scripts/golden_3d_dist.py \
      --side ours --platform default --label ours_tpu_defaultprec
  python scripts/golden_3d_dist.py --side ours --platform default \
      --label ours_tpu_highest
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "ours"], required=True)
    ap.add_argument("--label", type=str, default=None,
                    help="column name in the artifact (default: side)")
    ap.add_argument("--problems", type=str, default="1,6,7")
    ap.add_argument("--nseeds", type=int, default=4,
                    help="solver seeds per problem: p, 1000+p, 2000+p, ...")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--platform", type=str, default="cpu",
                    help="'cpu' or 'default' (ours side only)")
    ap.add_argument("--out", type=str, default="golden_3d_dist.json")
    args = ap.parse_args()

    label = args.label or args.side
    problems = [int(p) for p in args.problems.split(",")]

    import golden_3d as g

    if args.side == "ours":
        import jax
        if args.platform != "default":
            jax.config.update("jax_platforms", args.platform)
        runner = g.run_ours
    else:
        runner = g.run_reference

    art = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            art = json.load(fh)
    if art.get("iters") not in (None, args.iters):
        sys.exit(f"{args.out} holds iters={art['iters']}, not {args.iters}")
    art["iters"] = args.iters
    art.setdefault("workload", "hard problems of golden_3d (hyperbolic "
                   "events 32^3, 60% traces dropped, gain 40); N solver "
                   "seeds per problem per side")
    art.setdefault("problems", {})

    for p in problems:
        img, mask = g.make_problem(p)
        prob = art["problems"].setdefault(str(p), {})
        col = prob.setdefault(label, {})
        for j in range(args.nseeds):
            s = p + 1000 * j
            if str(s) in col:
                continue
            r = runner(img, mask, args.iters, seed=s)
            col[str(s)] = round(float(r["best_snr"]), 3)
            print(f"problem {p} {label} seed {s}: {r['best_snr']:.2f} dB "
                  f"({r['elapsed']:.0f}s)", flush=True)
            with open(args.out, "w") as fh:
                json.dump(art, fh, indent=2)

    # summary: per-problem means, and each ours column vs torch
    summary = {}
    for p, prob in art["problems"].items():
        summary[p] = {lab: round(sum(v.values()) / len(v), 2)
                      for lab, v in prob.items() if v}
    art["per_problem_mean_db"] = summary
    gaps = {}
    for p, means in summary.items():
        if "torch" not in means:
            continue
        for lab, m in means.items():
            if lab != "torch":
                gaps.setdefault(lab, []).append(m - means["torch"])
    art["mean_gap_vs_torch_db"] = {
        lab: round(sum(v) / len(v), 2) for lab, v in gaps.items()}
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=2)
    print(json.dumps({"per_problem_mean_db": summary,
                      "mean_gap_vs_torch_db": art["mean_gap_vs_torch_db"]}))


if __name__ == "__main__":
    main()
