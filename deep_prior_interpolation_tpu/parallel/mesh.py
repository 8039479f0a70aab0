"""Patch-parallel execution over a TPU device mesh.

This layer has no counterpart in the reference, whose unit of parallelism —
the patch — is processed strictly sequentially on one GPU (main.py:274-295;
see SURVEY §2.2). DIP patches are embarrassingly parallel: every patch owns
its private network + Adam state and there is no gradient exchange, so the
TPU-native design is:

  * ``vmap`` the whole scanned solver step over a batch of same-shaped
    patches (independent params per patch), and
  * lay the batch axis onto a 1-D ``jax.sharding.Mesh`` ("patch") so XLA
    SPMD places one patch group per chip; no collectives run in the hot
    loop, and the only cross-chip traffic is the final host gather of
    best outputs (assembly-time, parity with SURVEY §2.2's checklist).

Early stopping composes: each patch freezes through its ``done`` flag and the
host breaks out of the chunk loop when every patch in the batch is done.

Sizing guidance (r4 on-chip study, `scripts/bench_vmap_conv.py`, 176x104
64-ch bf16 patches, B=8; docs/PERF.md): vmapping per-patch conv KERNELS
produces grouped convolutions that run at ~1/3 of the sequential
single-patch rate (9.6 vs 27.9 TF/s) — so with the default
``vmap_conv_mode="grouped"``, prefer ``batch_patches == mesh_shape`` (one
patch per device). With ``vmap_conv_mode="tapmm"`` each conv tap becomes a
BATCHED matmul instead (63.1 TF/s — 6.6x the grouped lowering, 2.26x the
sequential per-patch rate), making multi-patch-per-chip batching a clear
win for patches that underutilise a chip; the mode is carried by
``StepSettings.conv_mode`` (part of the solver's jit cache key).
"""
from __future__ import annotations

import contextlib
import math
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..engine.history import History, HistoryPOCS, HistoryReg
from ..engine.solver import (DIPSolver, SolveResult, StepSettings,
                             build_base_input, build_data, build_hyper,
                             extract_noise_canvas, init_carry, make_run_chunk,
                             pad_multiple_for, padded_spatial)
from ..ops.pocs import fk_projection

# module-level so the projection is traced/compiled once, not once per patch
# (the axon relay's remote compiles can take minutes each)
_fk_projection_jit = jax.jit(fk_projection)


def make_mesh(n_devices: int = 0,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D "patch" mesh over the first ``n_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("patch",))


def overlap_add_sharded(patches, image_shape: Sequence[int],
                        dim: Sequence[int], stride: Sequence[int],
                        mesh: Mesh, normalize: bool = True) -> jnp.ndarray:
    """Overlap-add assembly of a patch batch sharded over the mesh.

    The one collective of the patch-parallel design (SURVEY §2.2): each
    device scatter-adds its local shard of ``patches`` (axis 0, grid order
    of :func:`deep_prior_interpolation_tpu.data.patcher.flat_index_map`)
    into a device-local volume, then a single ``psum`` over the "patch"
    axis assembles the full volume on every device — no per-patch host
    round-trips (the reference assembles on host with nested Python loops,
    utils/patch_extractor.py:370-428). Overlap counts depend only on the
    tiling geometry, so the normaliser is a host-precomputed constant.

    ``patches``: (P, *dim) with P a multiple of the mesh size. A batch
    padded with zero patches beyond the tiling's own count is accepted:
    the extra lanes scatter zeros (a no-op) at the first tile's indices.
    Returns the assembled ``image_shape`` volume (replicated; fetch once).
    """
    from ..data.patcher import flat_index_map

    n_dev = mesh.devices.size
    n_patches = patches.shape[0]
    assert n_patches % n_dev == 0, \
        f"patch count {n_patches} must be a multiple of mesh size {n_dev}"
    idx = flat_index_map(tuple(image_shape), tuple(dim), tuple(stride))
    assert idx.shape[0] <= n_patches, \
        f"tiling implies {idx.shape[0]} patches, got only {n_patches}"
    n_real = idx.shape[0]
    if n_real < n_patches:  # zero-padded lanes: aim them at tile 0
        assert not np.asarray(patches[n_real:]).any(), \
            f"patches beyond the tiling's {n_real} must be zero padding"
        idx = np.concatenate(
            [idx, np.broadcast_to(idx[:1], (n_patches - n_real,) + idx.shape[1:])])
    nflat = int(np.prod(image_shape))

    def local_add(patch_shard, idx_shard):
        flat = jnp.zeros(nflat, patch_shard.dtype)
        flat = flat.at[idx_shard.ravel()].add(patch_shard.reshape(-1))
        return jax.lax.psum(flat, "patch")

    sh = NamedSharding(mesh, P("patch"))
    fn = jax.jit(jax.shard_map(local_add, mesh=mesh,
                               in_specs=(P("patch"), P("patch")),
                               out_specs=P()))
    with jax.default_device(mesh.devices.flat[0]):
        out = fn(jax.device_put(jnp.asarray(patches), sh),
                 jax.device_put(jnp.asarray(idx), sh))
        if normalize:
            # counts from the REAL tiling only (padded lanes add zeros, not
            # coverage); cells the tiling never touches keep count 0 — clamp
            # to 1 so they stay 0 in the output instead of going NaN
            counts = np.zeros(nflat, np.float64)
            np.add.at(counts, idx[:n_real].ravel(), 1.0)
            out = out / jnp.asarray(np.maximum(counts, 1.0), out.dtype)
    return out.reshape(tuple(image_shape))


def setup_patch_batch(cfg: Config, solver: DIPSolver, s: StepSettings,
                      imgs: np.ndarray, masks: np.ndarray,
                      padded: Tuple[int, ...], input_shape: Tuple[int, ...],
                      seeds: Optional[np.ndarray] = None):
    """Batched per-patch setup in ONE compiled call.

    Derives each lane's PRNG keys, input noise canvas, data dict and fresh
    carry (model init + Adam state) under a single ``jit(vmap(...))`` —
    seed-identical to the former per-patch Python loop (lane ``i`` uses
    ``PRNGKey(cfg.seed + i)``; the jit-fused lowering may round the float
    draws ~1 ulp differently from eager setup, see docs/PERF.md r5) — but
    B eager ``model.init`` executions become one compile + one execution.
    Through the axon relay the serial loop cost ~30 s/lane (≈15 min of
    setup at B=32, dwarfing the 23 s solve); batched it is one round trip.

    The jitted wrapper is cached on ``solver`` (keyed by ``s``, the shapes,
    and every cfg field the setup reads) so repeated same-shape patch
    groups — the documented ceil(P/32) grouping — reuse one executable.

    ``seeds``: per-lane PRNG seed values (default ``cfg.seed + arange(B)``).
    """
    if seeds is None:
        seeds = cfg.seed + np.arange(imgs.shape[0])

    cache_key = (s, tuple(padded), tuple(input_shape),
                 # cfg fields consumed by build_base_input / build_data /
                 # init_carry and not already part of StepSettings
                 cfg.dtype, cfg.inputdepth, cfg.noise_dist, cfg.noise_std,
                 cfg.filter_noise_with_wavelet, cfg.lowpass_fs,
                 cfg.lowpass_fc, cfg.lowpass_ntaps, cfg.pocs_alpha,
                 cfg.inittype, cfg.initgain, cfg.lr)
    cache = solver.__dict__.setdefault("_setup_jits", {})
    if cache_key not in cache:
        def one(seed, img, mask):
            key = jax.random.PRNGKey(seed)
            k_noise, k_model = jax.random.split(key)
            if s.virtual_input:
                base_input = None
                data = build_data(cfg, s, img, mask, None, solver.dtype,
                                  input_key=k_noise)
            else:
                base_input = build_base_input(cfg, k_noise, padded,
                                              solver.dtype)
                data = build_data(cfg, s, img, mask, base_input, solver.dtype)
            carry = init_carry(solver.model, s, cfg, k_model, input_shape,
                               solver.outchannel, None, solver.dtype,
                               base_input=base_input)
            return carry, data

        cache[cache_key] = jax.jit(jax.vmap(one))

    return cache[cache_key](np.asarray(seeds, np.int32),
                            np.asarray(imgs, np.float32),
                            np.asarray(masks, np.float32))


def solve_patches_batched(cfg: Config, solver: DIPSolver,
                          patches: List[dict],
                          mesh: Optional[Mesh] = None) -> List[SolveResult]:
    """Solve a group of same-shaped patches concurrently.

    Batches with ``vmap`` on one chip; with ``cfg.mesh_shape > 1`` (or an
    explicit ``mesh``) the batch axis is sharded across the mesh. The batch
    is padded (by repeating the last patch) to a multiple of the mesh size;
    padded lanes are dropped from the returned results.
    """
    assert patches, "empty patch group"
    spatial = tuple(patches[0]["image"].shape[:-1])
    for p in patches:
        assert tuple(p["image"].shape[:-1]) == spatial, \
            "batched patches must share a shape; group by shape upstream"

    if mesh is None and cfg.mesh_shape and cfg.mesh_shape > 1:
        mesh = make_mesh(cfg.mesh_shape)

    n_real = len(patches)
    if mesh is not None:
        m = mesh.devices.size
        while len(patches) % m != 0:
            patches = patches + [patches[-1]]

    B = len(patches)
    mult0 = pad_multiple_for(cfg)
    padded0 = padded_spatial(spatial, mult0)
    input_shape = (1,) + padded0 + (cfg.inputdepth,)
    s = StepSettings.from_config(
        cfg, spatial, track_last=cfg.save_every is not None,
        takes_mask=getattr(solver.model, "takes_mask", False),
        input_shape=input_shape)
    run_chunk = make_run_chunk(solver.model, s)
    batched = jax.vmap(run_chunk, in_axes=(0, None, 0, None))
    if mesh is not None:
        # One local vmap per device over its patch shard: per-patch conv
        # kernels vmapped into grouped convs stay device-local instead of
        # being SPMD-partitioned (which XLA cannot do for grouped convs).
        sharded = jax.shard_map(
            batched, mesh=mesh,
            in_specs=(P("patch"), P(), P("patch"), P()),
            out_specs=(P("patch"), P("patch")))
        jitted = jax.jit(sharded, donate_argnums=0)
    else:
        jitted = jax.jit(batched, donate_argnums=0)

    mult = pad_multiple_for(cfg)
    padded = padded_spatial(spatial, mult)

    # Eager array creation (jnp.asarray in build_data, model.init in
    # init_carry, the stacking below) must land on the MESH's backend, not
    # whatever the process default happens to be — with a CPU mesh under a
    # TPU-default process the mixed placement is at best a transfer storm
    # and at worst a crash (round-1 MULTICHIP artifact).
    if mesh is not None:
        place = jax.default_device(mesh.devices.flat[0])
    else:
        place = contextlib.nullcontext()
    with place:
        carry, data = setup_patch_batch(
            cfg, solver, s,
            np.stack([np.asarray(p["image"], np.float32) for p in patches]),
            np.stack([np.asarray(p["mask"], np.float32) for p in patches]),
            padded, input_shape)
        hyper = build_hyper(cfg)

    if mesh is not None:
        sh = NamedSharding(mesh, P("patch"))
        carry = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), carry)
        data = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), data)

    chunk = max(1, min(cfg.scan_chunk, cfg.epochs))
    if cfg.save_every:
        chunk = math.gcd(chunk, int(cfg.save_every)) or 1
    n_chunks = math.ceil(cfg.epochs / chunk)
    hist_cls = HistoryPOCS if s.pocs else History
    hists = [hist_cls(cfg.epochs) for _ in range(B)]
    iters_run = [0] * B
    snapshots: List[Dict[int, np.ndarray]] = [{} for _ in range(B)]

    start = time.time()
    lane_elapsed: List[Optional[float]] = [None] * B

    def process_ys(ys) -> bool:
        """Fold one chunk's (B, K) scalar traces into the histories.

        Returns True while any lane was still live at the chunk's last
        step. Lane-done comes from ``ys["recorded"]`` (= ~done at each
        step), so no separate ``carry["done"]`` fetch — and no extra host
        round-trip — is needed.
        """
        ys = jax.device_get(ys)  # leaves: (B, K) scalars per step
        for b in range(B):
            n_rec = int(np.sum(ys["recorded"][b]))
            n_rec = min(n_rec, cfg.epochs - iters_run[b])
            hists[b].extend({k: v[b] for k, v in ys.items()}, n_rec)
            iters_run[b] += n_rec
        now = time.time() - start
        live = np.asarray(ys["recorded"][:, -1], bool)
        for b in range(B):
            # wall-clock until the chunk this lane froze in: honest per-lane
            # attribution (the lanes run concurrently, so sums exceed wall).
            # The pipelined loop observes it one chunk late — a <= 1-chunk
            # over-attribution, bounded by scan_chunk iterations
            if lane_elapsed[b] is None and not live[b]:
                lane_elapsed[b] = now
        return bool(live.any())

    # Pipelined dispatch: enqueue chunk c+1 BEFORE fetching chunk c's
    # scalars, so the device (and the axon relay pipeline) always holds the
    # next chunk while the host folds histories — the per-chunk host
    # round-trip no longer serialises against device compute. Early stop is
    # observed one chunk late (bounded overshoot: the lookahead chunk runs
    # on all-done lanes as a no-op; histories are unaffected because
    # recorded counts gate extension).
    pending = None  # previous chunk's ys futures
    for c in range(n_chunks):
        # host numpy on purpose: jit places it; an eager jnp.arange would
        # land on the process-default backend, not the mesh's
        iters = np.arange(c * chunk, (c + 1) * chunk, dtype=np.int32)
        carry, ys = jitted(carry, iters, data, hyper)
        end_iter = (c + 1) * chunk
        if cfg.save_every and end_iter % cfg.save_every == 0 \
                and end_iter < cfg.epochs:
            # deliberate sync point: snapshotting is user-driven IO, and
            # out_last must be fetched before the next dispatch donates it
            last = np.asarray(jax.device_get(carry["out_last"]), np.float32)
            for b in range(B):
                snapshots[b][end_iter] = last[b, 0]
        if pending is not None and not process_ys(pending):
            pending = ys  # all lanes froze before this chunk even ran
            break
        pending = ys
    if pending is not None:
        process_ys(pending)
    elapsed = time.time() - start
    lane_elapsed = [e if e is not None else elapsed for e in lane_elapsed]

    out_best = np.asarray(jax.device_get(carry["out_best"]), np.float32)
    results = []
    for b in range(n_real):
        take_b = lambda x: x[b]  # noqa: E731
        params_b = jax.tree_util.tree_map(take_b, carry["params"]["net"])
        data_b = jax.tree_util.tree_map(take_b, data)
        carry_b = {"params": jax.tree_util.tree_map(take_b, carry["params"])}
        noise_b = extract_noise_canvas(s, carry_b, data_b,
                                       data_b.get("base_input"), spatial)
        pocs_b = None
        if s.pocs:
            # jitted: the axon TPU relay cannot execute complex FFT ops
            # EAGERLY (UNIMPLEMENTED); compiled they lower fine
            proj = _fk_projection_jit(jnp.asarray(out_best[b]),
                                      data_b["pocs_wdata"],
                                      data_b["pocs_wmask"],
                                      hyper["pocs_thresh"])
            pocs_b = np.asarray(jax.device_get(proj)[0], np.float32)
        results.append(SolveResult(
            out_best=out_best[b, 0], history=hists[b], params=params_b,
            elapsed=lane_elapsed[b], iters_run=iters_run[b],
            stopped_early=iters_run[b] < cfg.epochs, snapshots=snapshots[b],
            noise=noise_b, pocs=pocs_b))
    return results
