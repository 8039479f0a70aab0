"""Headline benchmark: wall-clock per 1000 DIP iterations, 3D MulResUnet.

Reference baseline (BASELINE.md): the proof_of_concept_3D notebook runs a
(256,128,128,1) hyperbolic3d patch through MulResUnet3D (inputdepth 64,
filters [16,32,64,128,256], trilinear upsample, L1, Adam 1e-3, gain 40) at
~2.25 s/iter on a Tesla V100-PCIE-16GB => 2247 s per 1000 iterations.

This script runs the identical workload shape on the available accelerator
with the TPU-native chunked-scan solver, measures steady-state seconds per
1000 iterations (compile excluded), and prints ONE JSON line:
  {"metric": "sec_per_1000_iters_3d_mulresunet", "value": ..., "unit": "s",
   "vs_baseline": <speedup factor vs 2247 s>}

The hyperbolic3d dataset is not bundled (SURVEY §2.1 #23); data content does
not affect wall-clock, so a synthetic hyperbolic-events volume of the same
shape is used with the notebook's 66% trace decimation.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SEC_PER_1000 = 2247.0


def synth_hyperbolic(nt=256, nx=128, ny=128, seed=0) -> np.ndarray:
    """Synthetic 3D volume with hyperbolic events (same shape as the
    reference's hyperbolic3d patch)."""
    rng = np.random.RandomState(seed)
    t = np.arange(nt)[:, None, None]
    x = (np.arange(nx) - nx / 2)[None, :, None]
    y = (np.arange(ny) - ny / 2)[None, None, :]
    vol = np.zeros((nt, nx, ny), np.float32)
    for _ in range(6):
        t0 = rng.uniform(20, nt - 40)
        v = rng.uniform(2.0, 6.0)
        amp = rng.uniform(0.5, 1.0) * rng.choice([-1, 1])
        tt = np.sqrt(t0 ** 2 + (x / v) ** 2 + (y / v) ** 2)
        vol += amp * np.exp(-0.5 * ((t - tt) / 2.0) ** 2)
    vol /= np.abs(vol).max()
    return vol


def main() -> None:
    import jax
    if os.environ.get("BENCH_PLATFORM"):  # e.g. cpu, for CI smoke tests
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.engine import (DIPSolver, StepSettings,
                                                     build_base_input,
                                                     build_data, build_hyper,
                                                     init_carry,
                                                     make_run_chunk,
                                                     pad_multiple_for,
                                                     padded_spatial)

    nt, nx, ny = (int(v) for v in os.environ.get("BENCH_SHAPE", "256,128,128").split(","))
    iters_timed = int(os.environ.get("BENCH_ITERS", "100"))
    chunk = int(os.environ.get("BENCH_CHUNK", "25"))
    # bf16 convs; NO remat by default since round 3: phase-space execution +
    # bf16 + the materialised canvas fit the whole backward in HBM, and
    # remat_levels=1 was re-executing every res-0 block's layout copies in
    # the backward (s/1000 iters: no-remat 500.9 < remat1 525.8 < remat2
    # ~610 < remat3 ~660 at the r3 code state). The f32 no-remat variant
    # still exceeds HBM — never run BENCH_DTYPE=float32 without remat.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    remat_levels = int(os.environ.get("BENCH_REMAT_LEVELS", "1"))

    vol = synth_hyperbolic(nt, nx, ny)
    rng = np.random.RandomState(1)
    mask = np.repeat((rng.rand(1, nx, ny) > 0.66).astype(np.float32), nt, 0)
    img = (vol * 40.0)[..., None]  # gain 40 (notebook cell 4)
    msk = mask[..., None]

    # materialised input canvas measured faster than per-step regeneration
    # once phase-space freed the HBM (525.8 vs 535.1 s/1000, round 3)
    virtual = os.environ.get("BENCH_VIRTUAL", "0") == "1"
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    phase = os.environ.get("BENCH_PHASE", "1") == "1"
    # levels=2 measured 455.73 s/1000 vs 480.62 at levels=3 (r4 rebalance,
    # docs/PERF.md): at the no-remat cost structure the deepest phased
    # level's space-to-depth canvases cost more in layout than they return
    phase_levels = int(os.environ.get("BENCH_PHASE_LEVELS", "2"))
    phase_deep = int(os.environ.get("BENCH_PHASE_DEEP", "0"))
    # "tapmm" A/Bs the all-matmul conv formulation on the flagship
    # (StepSettings.conv_mode; see docs/PERF.md r4 structural conclusion)
    conv_mode = os.environ.get("BENCH_CONV_MODE", "grouped")
    import jax.numpy as jnp

    def setup(remat_on, remat_lv):
        cfg = Config(datadim="3d", epochs=iters_timed + 2 * chunk, loss="mae",
                     lr=1e-3, inputdepth=64, filters=[16, 32, 64, 128, 256],
                     skip=[16, 32, 64, 128], upsample="linear", gain=40.0,
                     reg_noise_std=0.03, scan_chunk=chunk, dtype=dtype,
                     remat=remat_on, remat_levels=remat_lv,
                     virtual_input=virtual, fused_loss=fused,
                     phase_space=phase, phase_levels=phase_levels,
                     phase_deep_levels=phase_deep, vmap_conv_mode=conv_mode)
        solver = DIPSolver(cfg, outchannel=1)
        spatial = tuple(img.shape[:-1])
        key = jax.random.PRNGKey(0)
        k_noise, k_model = jax.random.split(key)
        padded = padded_spatial(spatial, pad_multiple_for(cfg))
        input_shape = (1,) + padded + (cfg.inputdepth,)
        s = StepSettings.from_config(cfg, spatial, input_shape=input_shape)
        run_chunk = solver._get_run_chunk(s)
        if s.virtual_input:
            base_input = None
            data = build_data(cfg, s, img, msk, None, solver.dtype,
                              input_key=k_noise)
        else:
            base_input = build_base_input(cfg, k_noise, padded, solver.dtype)
            data = build_data(cfg, s, img, msk, base_input, solver.dtype)
        hyper = build_hyper(cfg)
        carry = init_carry(solver.model, s, cfg, k_model, input_shape, 1,
                           None, solver.dtype, base_input=base_input)
        return run_chunk, carry, data, hyper

    # warmup chunk (compile + first run); on HBM overflow fall back to
    # checkpointing progressively more scales (cheaper memory, more recompute)
    fallbacks = [] if remat else [(False, 0)]
    for x in [remat_levels, 2, 3, 0]:
        if (True, x) not in fallbacks:
            fallbacks.append((True, x))
    for r_on, lv in fallbacks:
        try:
            run_chunk, carry, data, hyper = setup(r_on, lv)
            carry, ys = run_chunk(carry, jnp.arange(0, chunk, dtype=jnp.int32),
                                  data, hyper)
            jax.block_until_ready(ys["loss"])
            break
        except Exception as e:  # noqa: BLE001 — OOM-driven retry
            msg = str(e).lower()
            # deeper remat only helps HBM pressure; a Mosaic scoped-VMEM
            # (kernel stack) overflow is remat-invariant — fail fast
            # instead of burning four more multi-minute relay compiles
            if ("memory" not in msg or "memory space vmem" in msg
                    or (r_on and lv == 0)):
                raise
            print(f"remat=({r_on},{lv}) overflowed HBM, retrying deeper",
                  file=sys.stderr, flush=True)

    # timed steady-state chunks
    n_chunks = max(1, iters_timed // chunk)
    t0 = time.time()
    for c in range(1, n_chunks + 1):
        carry, ys = run_chunk(
            carry, jnp.arange(c * chunk, (c + 1) * chunk, dtype=jnp.int32),
            data, hyper)
    jax.block_until_ready(ys["loss"])
    elapsed = time.time() - t0

    sec_per_1000 = elapsed / (n_chunks * chunk) * 1000.0
    print(json.dumps({
        "metric": "sec_per_1000_iters_3d_mulresunet",
        "value": round(sec_per_1000, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_SEC_PER_1000 / sec_per_1000, 2),
    }))


if __name__ == "__main__":
    main()
