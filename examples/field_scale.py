"""Field-scale workflow: tile a volume, solve patches over a device mesh,
re-assemble with overlap-add (BASELINE.json config #5).

A volume larger than one patch is tiled with overlap
(``--patch_shape/--patch_stride`` semantics, data.py:56-64 in the reference),
every patch runs its own DIP net — one patch per device over a 1-D
``Mesh(("patch",))`` — and the best outputs are averaged back together
(utils/patch_extractor.py:370-428 semantics, as one device scatter-add).

This is the full-pipeline proof (tile -> mesh-solve -> overlap-add ->
metric); `--out` records the assembled-volume SNR + wall-clock to a JSON
artifact (field_scale.json at the repo root carries the checked-in runs).

Usage:
  python examples/field_scale.py                      # default backend (TPU)
  python examples/field_scale.py --platform cpu --devices 8   # virtual mesh
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--platform", type=str, default="default",
                    help="'cpu' pins the host backend (the axon sitecustomize "
                         "latches JAX_PLATFORMS, so this must be set via "
                         "jax.config, not the environment)")
    ap.add_argument("--devices", type=int, default=0,
                    help="with --platform cpu: force this many virtual devices")
    ap.add_argument("--out", type=str, default=None,
                    help="append the run record to this JSON artifact")
    ap.add_argument("--batch", type=int, default=0,
                    help="patches solved concurrently per group (default: "
                         "one per device); >device_count batches multiple "
                         "nets per chip via vmap")
    ap.add_argument("--conv_mode", type=str, default="grouped",
                    choices=["grouped", "tapmm"],
                    help="conv formulation under the patch vmap: 'tapmm' "
                         "turns every kernel tap into one batched matmul "
                         "(6.6x the grouped lowering on-chip, docs/PERF.md)")
    args = ap.parse_args()

    if args.platform == "cpu" and args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    import deep_prior_interpolation_tpu as dpi
    from deep_prior_interpolation_tpu.data import (decimated_pair,
                                                   extract_patches,
                                                   reconstruct_patches)
    from deep_prior_interpolation_tpu.engine import DIPSolver
    from deep_prior_interpolation_tpu.ops import snr
    from deep_prior_interpolation_tpu.parallel import solve_patches_batched

    # a 2D "field" gather: 256 x 128 with 50% of traces missing
    vol, mask = decimated_pair(nt=256, nx=128, ny=None, rate=0.5, seed=3)

    n_dev = jax.device_count()
    batch = args.batch if args.batch > 0 else n_dev
    cfg = dpi.Config(datadim="2d", gain=1.0, epochs=args.epochs, loss="mae",
                     inputdepth=32, filters=[8, 16, 32], skip=[4, 8],
                     scan_chunk=50,
                     patch_shape=[128, 64], patch_stride=[64, 32],
                     batch_patches=batch, mesh_shape=n_dev if n_dev > 1 else 0,
                     vmap_conv_mode=args.conv_mode)

    patches = extract_patches(cfg, original=vol, corrupted=mask)
    print(f"{len(patches)} overlapping patches of "
          f"{patches[0]['image'].shape} over {n_dev} device(s)")

    solver = DIPSolver(cfg, outchannel=1)
    outs = []
    t0 = time.time()
    for start in range(0, len(patches), max(1, cfg.batch_patches)):
        group = patches[start:start + max(1, cfg.batch_patches)]
        results = solve_patches_batched(cfg, solver, group)
        outs.extend(r.out_best for r in results)
        print(f"  solved patches {start}..{start + len(group) - 1} "
              f"({time.time() - t0:.0f}s)", flush=True)
    elapsed = time.time() - t0

    recon = reconstruct_patches(cfg, patches_out=np.stack(outs), original=vol)
    out_snr = float(snr(recon, vol))
    print(f"reconstruction SNR {out_snr:.2f} dB "
          f"({len(patches)} patches, {args.epochs} iters each, {elapsed:.0f}s)")

    if args.out:
        art = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                art = json.load(fh)
        art.setdefault(
            "workload",
            "2D field gather 256x128, 50% traces dropped, tiled into "
            "patch 128x64 stride 64x32 (6 overlapping patches), one DIP "
            "net per patch, overlap-add assembly")
        key = (f"{jax.devices()[0].platform}_x{n_dev}dev_"
               f"{args.epochs}iters")
        if args.batch > 0:
            key += f"_b{args.batch}"
        if args.conv_mode != "grouped":
            key += f"_{args.conv_mode}"
        art[key] = {"snr_db": round(out_snr, 2),
                    "wall_s": round(elapsed, 1),
                    "n_patches": len(patches),
                    "devices": n_dev,
                    "backend": jax.devices()[0].platform}
        with open(args.out, "w") as fh:
            json.dump(art, fh, indent=2)
        print(f"recorded -> {args.out}")


if __name__ == "__main__":
    main()
