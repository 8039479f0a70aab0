"""Spatial (single-patch, model-parallel) sharding on the 8-device CPU mesh.

SURVEY §2.2 TP row: sharding the activation volumes of ONE patch along a
spatial axis, params replicated — the mode for volumes/precisions exceeding
one chip's HBM. The step function is the unsharded solver's; these tests pin
(a) placement specs, (b) trajectory parity vs the single-device solve, and
(c) that the sharded program really executes SPMD-partitioned (its compiled
chunk contains cross-device collectives).
"""
import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.engine import DIPSolver
from deep_prior_interpolation_tpu.engine.solver import (StepSettings,
                                                        build_base_input,
                                                        build_data,
                                                        init_carry,
                                                        pad_multiple_for,
                                                        padded_spatial)
from deep_prior_interpolation_tpu.parallel import (make_spatial_mesh,
                                                   shard_solver_state)


def one_patch(rng, nt=24, nx=32):
    t = np.linspace(0, 1, nt)[:, None]
    x = np.linspace(0, 1, nx)[None, :]
    img = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)[..., None]
    mask = np.repeat((rng.rand(1, nx) > 0.5).astype(np.float32),
                     nt, 0)[..., None]
    return img, mask


def cfg(**kw):
    base = dict(datadim="2d", epochs=10, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=5, gain=1.0)
    base.update(kw)
    return Config(**base)


def test_placement_specs(rng):
    c = cfg()
    img, mask = one_patch(rng)
    mesh = make_spatial_mesh(8)
    spatial = img.shape[:-1]
    padded = padded_spatial(spatial, pad_multiple_for(c))
    input_shape = (1,) + padded + (c.inputdepth,)
    s = StepSettings.from_config(c, spatial, input_shape=input_shape)
    key = jax.random.PRNGKey(0)
    base = build_base_input(c, key, padded)
    data = build_data(c, s, img, mask, base)
    solver = DIPSolver(c, outchannel=1)
    carry = init_carry(solver.model, s, c, key, input_shape, 1,
                       base_input=base)

    data, carry = shard_solver_state(mesh, 1, data, carry)
    # (1, t, x, C): spatial axis 1 = x -> array dim 2
    assert data["img"].sharding == NamedSharding(mesh, P(None, None, "space",
                                                         None))
    assert data["base_input"].sharding.spec == P(None, None, "space", None)
    assert carry["out_best"].sharding.spec == P(None, None, "space", None)
    # params + scalar trackers replicate
    kernel = jax.tree_util.tree_leaves(carry["params"]["net"])[0]
    assert kernel.sharding.spec == P()
    assert carry["loss_min"].sharding.spec == P()


def test_config_validates_spatial_flags():
    with pytest.raises(ValueError, match="mutually"):
        cfg(spatial_shards=8, batch_patches=4)
    with pytest.raises(ValueError, match="spatial_axis"):
        cfg(spatial_shards=8, spatial_axis=2)  # 2d has spatial dims 0..1
    cfg(spatial_shards=8, spatial_axis=1)  # valid


def test_axis_too_short_raises():
    mesh = make_spatial_mesh(8)
    small = {"img": np.zeros((1, 24, 4, 1), np.float32)}  # x=4 < 8 devices
    with pytest.raises(AssertionError, match="mesh size"):
        shard_solver_state(mesh, 1, small, {})


def test_sharded_solve_matches_single_device(rng):
    c = cfg()
    img, mask = one_patch(rng)
    mesh = make_spatial_mesh(8)

    seq = DIPSolver(c, outchannel=1).solve(img, mask, seed=0)
    shd = DIPSolver(c, outchannel=1).solve(img, mask, seed=0,
                                           spatial_mesh=mesh, spatial_axis=1)
    # identical keys -> identical trajectory up to the reduction-order noise
    # of the GSPMD all-reduces (norm stats + weight grads); assert tightly
    # early, coarsely late (test_parallel.py's contract)
    np.testing.assert_allclose(shd.history.loss[:3], seq.history.loss[:3],
                               rtol=1e-3, atol=1e-6)
    assert abs(shd.history.loss[-1] - seq.history.loss[-1]) < \
        0.5 * seq.history.loss[0]
    assert shd.out_best.shape == seq.out_best.shape
    assert np.all(np.isfinite(shd.out_best))
    np.testing.assert_allclose(shd.out_best, seq.out_best,
                               atol=0.5 * float(np.abs(seq.out_best).max()))


def test_sharded_chunk_contains_collectives(rng):
    """The sharded program must actually partition: conv halo exchanges
    (collective-permute) and/or statistic/gradient all-reduces appear in
    the compiled chunk — i.e. GSPMD split the work instead of silently
    gathering everything onto one device."""
    from deep_prior_interpolation_tpu.engine.solver import build_hyper

    c = cfg(epochs=5, scan_chunk=5)
    img, mask = one_patch(rng)
    mesh = make_spatial_mesh(8)
    spatial = img.shape[:-1]
    padded = padded_spatial(spatial, pad_multiple_for(c))
    input_shape = (1,) + padded + (c.inputdepth,)
    s = StepSettings.from_config(c, spatial, input_shape=input_shape)
    key = jax.random.PRNGKey(0)
    base = build_base_input(c, key, padded)
    data = build_data(c, s, img, mask, base)
    solver = DIPSolver(c, outchannel=1)
    carry = init_carry(solver.model, s, c, key, input_shape, 1,
                       base_input=base)
    data, carry = shard_solver_state(mesh, 1, data, carry)

    run = solver._get_run_chunk(s)
    hyper = build_hyper(c)
    iters = np.arange(0, 5, dtype=np.int32)
    txt = run.lower(carry, iters, data, hyper).compile().as_text()
    assert ("collective-permute" in txt) or ("all-reduce" in txt), \
        "sharded chunk compiled without any cross-device collective"


def test_sharded_resume_roundtrip(rng, tmp_path):
    """Exact mid-run resume composes with spatial sharding: the reloaded
    carry is re-placed on the mesh and the continued run matches an
    uninterrupted one."""
    c = cfg(epochs=8, scan_chunk=2)
    img, mask = one_patch(rng)
    mesh = make_spatial_mesh(8)
    ckpt = str(tmp_path / "state")

    full = DIPSolver(c, outchannel=1).solve(
        img, mask, seed=0, spatial_mesh=mesh, spatial_axis=1)
    # interrupted at chunk 2 (4 iters), then resumed to the same budget
    DIPSolver(cfg(epochs=4, scan_chunk=2), outchannel=1).solve(
        img, mask, seed=0, spatial_mesh=mesh, spatial_axis=1,
        checkpoint_path=ckpt, checkpoint_every=1)
    res = DIPSolver(c, outchannel=1).solve(
        img, mask, seed=0, spatial_mesh=mesh, spatial_axis=1,
        checkpoint_path=ckpt, checkpoint_every=1)
    assert res.iters_run == full.iters_run == 8
    np.testing.assert_allclose(res.history.loss, full.history.loss,
                               rtol=1e-4, atol=1e-7)


def test_sharded_solve_3d(rng):
    c = Config(datadim="3d", epochs=6, scan_chunk=3, inputdepth=4,
               filters=[8, 16], skip=[4], gain=1.0, upsample="linear")
    nt, nx, ny = 16, 16, 8
    t = np.linspace(0, 1, nt)[:, None, None]
    x = np.linspace(0, 1, nx)[None, :, None]
    y = np.linspace(0, 1, ny)[None, None, :]
    img = np.sin(2 * np.pi * (2 * t + x + y)).astype(np.float32)[..., None]
    mask = np.repeat((rng.rand(1, nx, ny) > 0.4).astype(np.float32),
                     nt, 0)[..., None]
    mesh = make_spatial_mesh(8)
    res = DIPSolver(c, outchannel=1).solve(img, mask, seed=0,
                                           spatial_mesh=mesh, spatial_axis=1)
    assert res.out_best.shape == img.shape
    assert np.all(np.isfinite(res.out_best))
    assert np.all(np.isfinite(res.history.loss))
