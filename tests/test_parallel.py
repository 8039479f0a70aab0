"""Patch-parallel layer tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.engine import DIPSolver
from deep_prior_interpolation_tpu.parallel import make_mesh, solve_patches_batched


def make_patches(rng, n, nt=24, nx=16):
    t = np.linspace(0, 1, nt)[:, None]
    x = np.linspace(0, 1, nx)[None, :]
    out = []
    for i in range(n):
        img = np.sin(2 * np.pi * ((2 + i) * t + 2 * x)).astype(np.float32)[..., None]
        mask = np.repeat((rng.rand(1, nx) > 0.5).astype(np.float32), nt, 0)[..., None]
        out.append({"image": img, "mask": mask, "name": str(i)})
    return out


def cfg(**kw):
    base = dict(datadim="2d", epochs=20, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=10, gain=1.0)
    base.update(kw)
    return Config(**base)


def test_mesh_has_8_cpu_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_vmap_batch_matches_sequential(rng):
    patches = make_patches(rng, 2)
    c = cfg()
    solver = DIPSolver(c, outchannel=1)
    batched = solve_patches_batched(c, solver, patches)
    for patch, res in zip(patches, batched):
        seq = DIPSolver(c, outchannel=1).solve(
            patch["image"], patch["mask"],
            key=jax.random.PRNGKey(c.seed + int(patch["name"])))
        # identical keys -> identical noise/params -> same trajectory up to
        # XLA fusion-order noise. fp noise compounds chaotically through the
        # optimisation (especially at unobserved traces), so assert tightly
        # on the early losses and only coarsely on the endpoint; the
        # reconstruction itself is checked for finiteness + shape.
        np.testing.assert_allclose(res.history.loss[:5], seq.history.loss[:5],
                                   rtol=1e-3, atol=1e-6)
        assert abs(res.history.loss[-1] - seq.history.loss[-1]) < \
            0.5 * seq.history.loss[0]
        assert res.out_best.shape == seq.out_best.shape
        assert np.all(np.isfinite(res.out_best))


def test_sharded_batch_over_mesh(rng):
    patches = make_patches(rng, 8)
    c = cfg(mesh_shape=8, epochs=10)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    assert len(results) == 8
    for r in results:
        assert r.iters_run == 10
        assert np.isfinite(r.history.loss[-1])


def test_batch_padding_to_mesh(rng):
    # 5 patches on an 8-device mesh -> padded internally, 5 results out
    patches = make_patches(rng, 5)
    c = cfg(mesh_shape=8, epochs=6, scan_chunk=6)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    assert len(results) == 5


def test_batched_early_stop(rng):
    patches = make_patches(rng, 2)
    c = cfg(epochs=30, earlystop_patience=2, earlystop_min_delta=80.0)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    assert all(r.iters_run < 30 for r in results)


def make_patches_3d(rng, n, nt=16, nx=8, ny=8):
    """Half structured (keeps improving), half noise (dries up early)."""
    t = np.linspace(0, 1, nt)[:, None, None]
    x = np.linspace(0, 1, nx)[None, :, None]
    y = np.linspace(0, 1, ny)[None, None, :]
    out = []
    for i in range(n):
        if i % 2 == 0:
            img = np.sin(2 * np.pi * ((2 + i) * t + 2 * x + y)).astype(np.float32)
        else:
            img = rng.randn(nt, nx, ny).astype(np.float32)
        mask = np.repeat((rng.rand(1, nx, ny) > 0.4).astype(np.float32), nt, 0)
        out.append({"image": img[..., None], "mask": mask[..., None],
                    "name": str(i)})
    return out


def cfg3d(**kw):
    base = dict(datadim="3d", epochs=9, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=3, gain=1.0, upsample="linear",
                phase_space=True, phase_levels=1, remat=True)
    base.update(kw)
    return Config(**base)


def test_sharded_3d_phase_remat_matches_sequential(rng):
    """3D patches with phase-space + remat over the mesh, >= 3 chunks; every
    lane must reproduce the sequential solver (same per-patch key)."""
    patches = make_patches_3d(rng, 8)
    c = cfg3d(mesh_shape=8)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    seq_solver = DIPSolver(c, outchannel=1)
    for i, (patch, r) in enumerate(zip(patches, results)):
        seq = seq_solver.solve(patch["image"], patch["mask"],
                               key=jax.random.PRNGKey(c.seed + i))
        np.testing.assert_allclose(r.history.loss[:3], seq.history.loss[:3],
                                   rtol=1e-3, atol=1e-6)
        assert r.out_best.shape == seq.out_best.shape
        assert np.all(np.isfinite(r.out_best))


def test_sharded_divergent_early_stop(rng):
    """Lanes stopping at different iterations across several chunks: the
    frozen lanes' state/history must match their sequential runs exactly
    (the done-masking machinery, solver._mask_tree / mesh recorded flags)."""
    patches = make_patches_3d(rng, 8)
    c = cfg3d(mesh_shape=8, earlystop_patience=2, earlystop_min_delta=2.0)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    seq_solver = DIPSolver(c, outchannel=1)
    iters = []
    for i, (patch, r) in enumerate(zip(patches, results)):
        seq = seq_solver.solve(patch["image"], patch["mask"],
                               key=jax.random.PRNGKey(c.seed + i))
        assert r.iters_run == seq.iters_run, (i, r.iters_run, seq.iters_run)
        assert len(r.history.loss) == r.iters_run  # frozen lanes not extended
        iters.append(r.iters_run)
    assert len(set(iters)) > 1, f"early stops did not diverge: {iters}"


def test_sharded_pocs(rng):
    """DIP+POCS (FFT projection + adaptive eps) inside the sharded step."""
    patches = make_patches(rng, 8)
    c = cfg(mesh_shape=8, epochs=6, scan_chunk=2, pocs=True)
    solver = DIPSolver(c, outchannel=1)
    results = solve_patches_batched(c, solver, patches)
    assert len(results) == 8
    for r in results:
        assert np.all(np.isfinite(r.history.loss))
        assert np.all(np.isfinite(r.history.eps))
        assert r.pocs is not None and r.pocs.shape == r.out_best.shape
        assert np.all(np.isfinite(r.pocs))


def test_vmap_tapmm_matches_sequential(rng):
    # cfg.vmap_conv_mode="tapmm": the batched solver re-expresses convs as
    # per-tap batched matmuls (conv_vjp.conv_impl); trajectory must match
    # the sequential conv-formulation solver to fp-noise tolerance
    patches = make_patches(rng, 2)
    c = cfg(vmap_conv_mode="tapmm")
    solver = DIPSolver(c, outchannel=1)
    batched = solve_patches_batched(c, solver, patches)
    from deep_prior_interpolation_tpu.ops import conv_vjp
    assert conv_vjp._CONV_IMPL == "conv"  # restored after the solve
    for patch, res in zip(patches, batched):
        seq = DIPSolver(c, outchannel=1).solve(
            patch["image"], patch["mask"],
            key=jax.random.PRNGKey(c.seed + int(patch["name"])))
        np.testing.assert_allclose(res.history.loss[:5], seq.history.loss[:5],
                                   rtol=1e-3, atol=1e-6)
        assert np.all(np.isfinite(res.out_best))
