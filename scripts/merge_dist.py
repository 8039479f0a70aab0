"""Merge a side-file distribution artifact (e.g. golden_3d_dist_tpu.json,
written by a concurrent TPU run of scripts/golden_3d_dist.py --out ...) into
golden_3d_dist.json, then recompute the per-problem means and mean gaps.

Needed because golden_3d_dist.py rewrites its --out file wholesale after
every seed: two concurrent writers to the same file would clobber each
other, so the TPU side writes to its own file and merges here AFTER the
CPU-side process has exited.

Usage: python scripts/merge_dist.py golden_3d_dist_tpu.json
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    src_path = sys.argv[1]
    dst_path = sys.argv[2] if len(sys.argv) > 2 else "golden_3d_dist.json"
    with open(src_path) as fh:
        src = json.load(fh)
    with open(dst_path) as fh:
        dst = json.load(fh)
    if src.get("iters") != dst.get("iters"):
        sys.exit(f"iters mismatch: {src.get('iters')} vs {dst.get('iters')}")

    for p, prob in src.get("problems", {}).items():
        dprob = dst["problems"].setdefault(p, {})
        for label, col in prob.items():
            dcol = dprob.setdefault(label, {})
            for seed, snr in col.items():
                if seed in dcol and dcol[seed] != snr:
                    sys.exit(f"conflict: problem {p} {label} seed {seed}: "
                             f"{dcol[seed]} vs {snr}")
                dcol[seed] = snr

    summary = {}
    for p, prob in dst["problems"].items():
        summary[p] = {lab: round(sum(v.values()) / len(v), 2)
                      for lab, v in prob.items() if v}
    dst["per_problem_mean_db"] = summary
    gaps = {}
    for p, means in summary.items():
        if "torch" not in means:
            continue
        for lab, m in means.items():
            if lab != "torch":
                gaps.setdefault(lab, []).append(m - means["torch"])
    dst["mean_gap_vs_torch_db"] = {
        lab: round(sum(v) / len(v), 2) for lab, v in gaps.items()}
    with open(dst_path, "w") as fh:
        json.dump(dst, fh, indent=2)
    print(json.dumps({"per_problem_mean_db": summary,
                      "mean_gap_vs_torch_db": dst["mean_gap_vs_torch_db"]}))


if __name__ == "__main__":
    main()
