"""2D small-patch benchmark: amortised s/1000 DIP iterations per patch.

BASELINE.md row 1: the reference solves the bundled lines gather (170x100,
MulResUnet 2D, inputdepth 64, filters [16,32,64,128,256], L1, Adam 1e-3,
gain 1) at ~47 ms/iter on a Tesla V100 (proof_of_concept_2D.ipynb cell 15)
=> 47 s per 1000 iterations per patch. A single v5e chip at that patch size
is badly under-utilised, so the TPU-native answer is to batch B independent
DIP problems (per-patch weights, vmap over the patch axis) on ONE chip and
amortise:

    s_per_1000_per_patch = steady_elapsed / iters / B * 1000

Modes (BENCH2D_MODE): "tapmm" (default — every conv tap is one batched
matmul, docs/PERF.md r4 study), "grouped" (XLA's lowering of the vmapped
conv), "serial" (B=1, no vmap: the single-patch rate).

Compile is excluded (one warmup chunk); the steady-state fence is a host
VALUE fetch of the final chunk's losses (PERF.md: block_until_ready can
return early through the axon relay; every chunk depends on the previous
carry, so the final fetch forces the whole timed chain).

Writes/updates the keyed JSON artifact (default BENCH_2D.json) and prints
one JSON line {"metric": "sec_per_1000_iters_per_patch_2d", ...,
"vs_baseline": 47.0 / value}.

Env knobs: BENCH2D_B (16), BENCH2D_ITERS (300), BENCH2D_CHUNK (100),
BENCH2D_MODE (tapmm), BENCH2D_DTYPE (bfloat16), BENCH2D_PLATFORM (e.g. cpu
for a smoke run), BENCH2D_OUT (BENCH_2D.json; "none" disables).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_SEC_PER_1000 = 47.0  # V100, proof_of_concept_2D.ipynb cell 15


def main() -> None:
    import jax
    if os.environ.get("BENCH2D_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH2D_PLATFORM"])
    import jax.numpy as jnp

    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.data import lines_dataset
    from deep_prior_interpolation_tpu.engine import (DIPSolver, StepSettings,
                                                     build_hyper,
                                                     make_run_chunk,
                                                     pad_multiple_for,
                                                     padded_spatial)

    B = int(os.environ.get("BENCH2D_B", "16"))
    iters_timed = int(os.environ.get("BENCH2D_ITERS", "300"))
    chunk = int(os.environ.get("BENCH2D_CHUNK", "100"))
    mode = os.environ.get("BENCH2D_MODE", "tapmm")
    dtype = os.environ.get("BENCH2D_DTYPE", "bfloat16")
    out_path = os.environ.get("BENCH2D_OUT", "BENCH_2D.json")
    assert mode in ("tapmm", "grouped", "serial"), mode
    if mode == "serial":
        B = 1

    img, mask0 = lines_dataset()  # (170, 100, 1) f32 + 66%-dropped mask
    spatial = tuple(img.shape[:-1])
    rng = np.random.RandomState(0)
    masks = [mask0] + [
        np.repeat((rng.rand(1, spatial[1]) > 0.66).astype(np.float32),
                  spatial[0], 0)[..., None]
        for _ in range(B - 1)]

    cfg = Config(datadim="2d", epochs=iters_timed + 2 * chunk, loss="mae",
                 lr=1e-3, inputdepth=64, filters=[16, 32, 64, 128, 256],
                 skip=[16, 32, 64, 128], upsample="nearest", gain=1.0,
                 reg_noise_std=0.03, scan_chunk=chunk, dtype=dtype,
                 vmap_conv_mode="tapmm" if mode == "tapmm" else "grouped")
    solver = DIPSolver(cfg, outchannel=1)

    mult = pad_multiple_for(cfg)
    padded = padded_spatial(spatial, mult)
    input_shape = (1,) + padded + (cfg.inputdepth,)
    s = StepSettings.from_config(cfg, spatial, input_shape=input_shape)
    run_chunk = make_run_chunk(solver.model, s)
    if mode == "serial":
        jitted = jax.jit(run_chunk, donate_argnums=0)
    else:
        jitted = jax.jit(jax.vmap(run_chunk, in_axes=(0, None, 0, None)),
                         donate_argnums=0)

    # batched one-jit setup (lane b seeds PRNGKey(b)): B model inits in one
    # compiled call instead of B eager relay round trips (~30 s/lane)
    from deep_prior_interpolation_tpu.parallel import setup_patch_batch
    carry, data = setup_patch_batch(
        cfg, solver, s, np.stack([img] * B), np.stack(masks),
        padded, input_shape, seeds=np.arange(B))
    if mode == "serial":
        carry = jax.tree_util.tree_map(lambda x: x[0], carry)
        data = jax.tree_util.tree_map(lambda x: x[0], data)
    hyper = build_hyper(cfg)

    # warmup chunk: compile + first execution
    t0 = time.time()
    carry, ys = jitted(carry, jnp.arange(0, chunk, dtype=jnp.int32),
                       data, hyper)
    first_loss = np.asarray(jax.device_get(ys["loss"]), np.float32)
    compile_s = time.time() - t0
    assert np.all(np.isfinite(first_loss)), "non-finite losses in warmup"

    n_chunks = max(1, iters_timed // chunk)
    t0 = time.time()
    for c in range(1, n_chunks + 1):
        carry, ys = jitted(
            carry, jnp.arange(c * chunk, (c + 1) * chunk, dtype=jnp.int32),
            data, hyper)
    # host VALUE fetch = the only trustworthy fence through the relay
    final_loss = np.asarray(jax.device_get(ys["loss"]), np.float32)
    elapsed = time.time() - t0
    assert np.all(np.isfinite(final_loss)), "non-finite losses in timed run"

    value = elapsed / (n_chunks * chunk) / B * 1000.0
    rec = {
        "metric": "sec_per_1000_iters_per_patch_2d",
        "value": round(value, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_SEC_PER_1000 / value, 2),
    }
    print(json.dumps(rec))

    if out_path != "none":
        art = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                art = json.load(fh)
        art.setdefault(
            "workload",
            "BASELINE.md row 1: lines 170x100 gather, MulResUnet2D, "
            "inputdepth 64, filters [16,32,64,128,256], L1, Adam 1e-3, "
            "gain 1; B independent patches batched on one chip; "
            "steady-state s/1000 iters per patch (compile excluded); "
            "V100 reference 47 s")
        key = (f"{jax.devices()[0].platform}_{mode}_b{B}_{dtype}_"
               f"chunk{chunk}")
        art[key] = dict(rec, batch=B, iters=n_chunks * chunk, chunk=chunk,
                        wall_s=round(elapsed, 1),
                        compile_plus_first_chunk_s=round(compile_s, 1),
                        backend=jax.devices()[0].platform)
        with open(out_path, "w") as fh:
            json.dump(art, fh, indent=2)
        print(f"recorded -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
