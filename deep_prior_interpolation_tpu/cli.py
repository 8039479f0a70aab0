"""Command-line driver.

Capability parity with the reference entry points ``main.py:254-301`` and
``main_pocs.py:289-337``, unified: ``--pocs`` switches the solver to the
DIP+POCS engine instead of forking the driver. Flow per run:

  parse args -> results/<outdir|random>/args.txt manifest -> extract patches
  -> per patch: skip all-corrupted (std ~ 0, main.py:281-284), build/load
  model (transfer learning via --net load --netdir, main.py:105-110,286-290),
  optimise, save <name>_run.npz bundle (+ weights with --savemodel)
  -> done.

Improvements over the reference, documented:
  * idempotent resume: patches with an existing ``*_run.npz`` are skipped
    (the reference loses nothing on crash but re-runs everything, SURVEY §5)
  * ``--batch_patches N`` solves N same-shaped patches at once with vmap;
    ``--mesh_shape M`` shards the batch over an M-device mesh.
  * ``--spatial_shards N`` shards each SINGLE patch's activation volumes
    over N devices along ``--spatial_axis`` (model-parallel; for volumes or
    precisions exceeding one chip's HBM — parallel/spatial.py).
"""
from __future__ import annotations

import os
import sys
import time
from typing import List, Optional, Sequence

import numpy as np

from .config import Config, parse_arguments, write_args
from .data import extract_patches
from .engine import DIPSolver
from .io import completed_patches, load_checked, save_params, save_run
from .models import get_net
from .utils.generic import random_code, sec2time


def _log(msg: str) -> None:
    print(msg, flush=True)


def run(cfg: Config, results_root: str = "./results",
        original: Optional[np.ndarray] = None,
        corrupted: Optional[np.ndarray] = None) -> str:
    """Execute a full interpolation run; returns the output directory."""
    if cfg.gpu is not None:
        # --gpu N pins the run to the N-th accelerator (the TPU-native
        # equivalent of the reference's CUDA_VISIBLE_DEVICES pinning,
        # utils/torch.py:165-185); out-of-range indices fall back to the
        # default device with a warning instead of crashing.
        import jax
        devs = jax.devices()
        if 0 <= cfg.gpu < len(devs):
            jax.config.update("jax_default_device", devs[cfg.gpu])
        else:
            _log(f"warning: --gpu {cfg.gpu} out of range "
                 f"({len(devs)} devices); using the default device")
    outpath = os.path.join(results_root,
                           cfg.outdir if cfg.outdir is not None else random_code())
    os.makedirs(outpath, exist_ok=True)
    _log(f"Saving to {outpath}")
    write_args(os.path.join(outpath, "args.txt"), cfg)

    patches = extract_patches(cfg, original=original, corrupted=corrupted)
    _log(f"Processing {len(patches)} patches")

    done = set(completed_patches(outpath))

    outchannel = cfg.imgchannel or patches[0]["image"].shape[-1]
    solver = DIPSolver(cfg, outchannel=outchannel)

    if cfg.batch_patches and cfg.batch_patches > 1 and not cfg.start_from_prev:
        _run_batched(cfg, solver, patches, outpath, done)
        _log(f"Interpolation done! Saved to {outpath}")
        return outpath

    spatial_mesh = None
    if cfg.spatial_shards and cfg.spatial_shards > 1:
        from .parallel import make_spatial_mesh
        spatial_mesh = make_spatial_mesh(cfg.spatial_shards)
        _log(f"Spatial sharding: each patch over {cfg.spatial_shards} "
             f"devices along spatial axis {cfg.spatial_axis}")

    prev_params = None
    for i, patch in enumerate(patches):
        name = patch["name"]
        if name in done:
            _log(f"Patch {name} already done, skipping (resume)")
            continue
        img, mask = patch["image"], patch["mask"]
        _log(f"The data shape is {img.shape}")
        std = float(np.std(img * mask))
        _log(f"the std of coarse data is {std:.2e}")

        if np.isclose(std, 0.0, atol=1e-12):  # all traces corrupted
            _log("skipping...")
            out_best = img * mask
            from .engine.history import History
            hist = History(cfg.epochs)
            save_run(outpath, name, hist, mask, img, out_best, elapsed=0.0)
            continue

        init_params = None
        if len(cfg.netdir) != 0:
            template = solver.model  # build a template pytree for loading
            import jax
            import jax.numpy as jnp
            from .engine.solver import pad_multiple_for, padded_spatial
            padded = padded_spatial(img.shape[:-1], pad_multiple_for(cfg))
            dummy = jnp.zeros((1,) + padded + (cfg.inputdepth,))
            tmpl = template.init(jax.random.PRNGKey(0), dummy)["params"]
            init_params = load_checked(cfg.netdir[min(i, len(cfg.netdir) - 1)],
                                       cfg, tmpl, results_root)
            _log(f"Network loaded from {cfg.netdir[min(i, len(cfg.netdir) - 1)]}")
        elif cfg.start_from_prev and prev_params is not None:
            init_params = prev_params

        res = solver.solve(
            img, mask, seed=cfg.seed + i, init_params=init_params,
            verbose=True,
            profile_dir=os.path.join(outpath, "profile") if cfg.profile
            else None,
            spatial_mesh=spatial_mesh, spatial_axis=cfg.spatial_axis)
        prev_params = res.params
        _log("\n" + sec2time(res.elapsed))

        save_run(outpath, name, res.history, mask, img, res.out_best,
                 elapsed=res.elapsed, noise=res.noise, pocs=res.pocs)
        for it, snap in res.snapshots.items():
            np.save(os.path.join(
                outpath, f"{name}_output{str(it).zfill(res.history.zfill)}.npy"),
                snap)
        if cfg.savemodel:
            save_params(os.path.join(outpath, f"{name}_model.msgpack"),
                        res.params)
        _log(f"Finished patch {name}")

    _log(f"Interpolation done! Saved to {outpath}")
    return outpath


def _run_batched(cfg: Config, solver: DIPSolver, patches: List[dict],
                 outpath: str, done: set) -> None:
    """vmap/shard_map fan-out over same-shaped patches."""
    from .parallel import solve_patches_batched

    todo = [p for p in patches if p["name"] not in done]
    B = cfg.batch_patches
    for start in range(0, len(todo), B):
        group = todo[start:start + B]
        results = solve_patches_batched(cfg, solver, group)
        for patch, res in zip(group, results):
            save_run(outpath, patch["name"], res.history, patch["mask"],
                     patch["image"], res.out_best, elapsed=res.elapsed,
                     noise=res.noise, pocs=res.pocs)
            for it, snap in res.snapshots.items():
                np.save(os.path.join(
                    outpath,
                    f"{patch['name']}_output{str(it).zfill(res.history.zfill)}.npy"),
                    snap)
            if cfg.savemodel:
                save_params(os.path.join(
                    outpath, f"{patch['name']}_model.msgpack"), res.params)
            _log(f"Finished patch {patch['name']}")


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg = parse_arguments(argv)
    run(cfg)


if __name__ == "__main__":
    main()
