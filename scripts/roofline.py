"""Analytic roofline: FLOPs per DIP iteration from XLA HLO cost analysis.

Trace-only — the solver step is lowered with ABSTRACT operands
(``jax.eval_shape`` for the carry/data pytrees, ``Lowered.cost_analysis()``
on the unoptimized HLO), so no backend compile and no flagship-sized arrays
are needed; runs on the 1-vCPU host in seconds.

Per-iteration numbers are differenced between a chunk-1 and a chunk-5 scan
(HLO cost analysis multiplies a while-body by its trip count when static;
the difference/4 isolates one iteration either way and cancels the
outside-scan setup).

Dot/conv FLOPs in unoptimized HLO are exact (2*M*N*K); elementwise flop
counts are pre-fusion and therefore slight over-counts — fine for a
roofline denominator. "bytes accessed" pre-fusion wildly over-counts real
HBM traffic and is intentionally NOT reported; the HBM-side argument in
docs/PERF.md uses the on-chip per-op profile instead.

Writes roofline.json rows: {workload: {flops_per_iter, ...}} and prints a
summary with achieved TF/s / %-of-peak when a measured s/iter is known.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFS = 197.0  # per chip
V5E_HBM_GBS = 819.0


def flops_per_iter(cfg, spatial, batch=0):
    """Lower run_chunk at chunk sizes 1 and 5 with abstract operands and
    difference the HLO flop counts."""
    import jax
    import jax.numpy as jnp

    from deep_prior_interpolation_tpu.engine import (DIPSolver, StepSettings,
                                                     build_base_input,
                                                     build_data, build_hyper,
                                                     init_carry,
                                                     make_run_chunk,
                                                     pad_multiple_for,
                                                     padded_spatial)

    solver = DIPSolver(cfg, outchannel=1)
    padded = padded_spatial(spatial, pad_multiple_for(cfg))
    input_shape = (1,) + padded + (cfg.inputdepth,)
    s = StepSettings.from_config(cfg, spatial, input_shape=input_shape)
    run_chunk = make_run_chunk(solver.model, s)

    img_sd = jax.ShapeDtypeStruct(tuple(spatial) + (1,), np.float32)

    def make_state(img, mask):
        key = jax.random.PRNGKey(0)
        k_noise, k_model = jax.random.split(key)
        base = build_base_input(cfg, k_noise, padded, solver.dtype)
        data = build_data(cfg, s, img, mask, base, solver.dtype)
        carry = init_carry(solver.model, s, cfg, k_model, input_shape, 1,
                           None, solver.dtype, base_input=base)
        return carry, data

    carry_sd, data_sd = jax.eval_shape(make_state, img_sd, img_sd)
    hyper = build_hyper(cfg)
    hyper_sd = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), hyper)

    fn = run_chunk
    if batch:
        fn = jax.vmap(run_chunk, in_axes=(0, None, 0, None))
        stackB = lambda sd: jax.ShapeDtypeStruct((batch,) + sd.shape, sd.dtype)
        carry_sd = jax.tree_util.tree_map(stackB, carry_sd)
        data_sd = jax.tree_util.tree_map(stackB, data_sd)

    def cost(chunk):
        iters_sd = jax.ShapeDtypeStruct((chunk,), jnp.int32)
        lo = jax.jit(fn).lower(carry_sd, iters_sd, data_sd, hyper_sd)
        return lo.cost_analysis()["flops"]

    f1, f5 = cost(1), cost(5)
    per_iter = (f5 - f1) / 4.0 if f5 > f1 * 1.5 else f1
    return float(per_iter)


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from deep_prior_interpolation_tpu.config import Config

    flag = dict(datadim="3d", loss="mae", lr=1e-3, inputdepth=64,
                filters=[16, 32, 64, 128, 256], skip=[16, 32, 64, 128],
                upsample="linear", gain=40.0, reg_noise_std=0.03,
                dtype="bfloat16")
    two_d = dict(datadim="2d", loss="mae", lr=1e-3, inputdepth=64,
                 filters=[16, 32, 64, 128, 256], skip=[16, 32, 64, 128],
                 upsample="nearest", gain=1.0, reg_noise_std=0.03,
                 dtype="bfloat16")
    rows = {
        "flagship_3d_phase2_bf16": (
            Config(phase_space=True, phase_levels=2, **flag),
            (256, 128, 128), 0),
        "flagship_3d_phase3_bf16": (
            Config(phase_space=True, phase_levels=3, **flag),
            (256, 128, 128), 0),
        "flagship_3d_plain_bf16": (
            Config(phase_space=False, **flag), (256, 128, 128), 0),
        "lines_2d_b16_tapmm_bf16": (
            Config(vmap_conv_mode="tapmm", **two_d), (170, 100), 16),
        "lines_2d_serial_bf16": (
            Config(**two_d), (170, 100), 0),
    }

    out = {}
    for name, (cfg, spatial, batch) in rows.items():
        f = flops_per_iter(cfg, spatial, batch)
        out[name] = {"flops_per_iter": f, "tflops_per_iter": round(f / 1e12, 4),
                     "batch": batch or 1}
        print(f"{name:32s} {f/1e12:8.4f} TF/iter"
              + (f"  ({f/1e12/batch:.4f} TF/iter/patch)" if batch else ""),
              flush=True)

    with open("roofline.json", "w") as fh:
        json.dump({"v5e_bf16_peak_tfs": V5E_BF16_PEAK_TFS,
                   "v5e_hbm_gbs": V5E_HBM_GBS,
                   "note": "flops from unoptimized-HLO cost analysis "
                           "(dot/conv exact, elementwise pre-fusion); "
                           "per-iter via chunk-5 minus chunk-1 differencing",
                   "workloads": out}, fh, indent=2)
    print("wrote roofline.json")


if __name__ == "__main__":
    main()
