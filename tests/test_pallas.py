"""Pallas fused loss/metrics kernel vs the jnp reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.ops import masked_mae, masked_mse, pcorr, snr
from deep_prior_interpolation_tpu.ops.pallas_kernels import fused_loss_metrics


@pytest.fixture
def problem(rng):
    out = jnp.asarray(rng.randn(33, 50, 1).astype(np.float32))
    img = jnp.asarray(rng.randn(33, 50, 1).astype(np.float32))
    mask = jnp.asarray((rng.rand(33, 50, 1) > 0.5).astype(np.float32))
    return out, img, mask


def test_fused_matches_reference(problem):
    out, img, mask = problem
    loss, m = fused_loss_metrics(out, img, mask, "mae", interpret=True)
    np.testing.assert_allclose(float(loss), float(masked_mae(out, img, mask)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["mse"]), float(masked_mse(out, img, mask)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["snr"]), float(snr(out, img)), rtol=1e-4)
    np.testing.assert_allclose(float(m["pcorr"]), float(pcorr(out, img)),
                               rtol=1e-3)


def test_fused_gradients_match(problem):
    out, img, mask = problem

    def f_pallas(o):
        return fused_loss_metrics(o, img, mask, "mae", interpret=True)[0]

    def f_ref(o):
        return masked_mae(o, img, mask)

    g_pallas = jax.grad(f_pallas)(out)
    g_ref = jax.grad(f_ref)(out)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-6)


def test_fused_l1_alias_matches_mae(problem):
    """loss='l1' (the CLI alias the solver accepts) must select the MAE sum,
    not silently fall through to MSE (advisor round-2, medium)."""
    out, img, mask = problem
    loss_l1, _ = fused_loss_metrics(out, img, mask, "l1", interpret=True)
    np.testing.assert_allclose(float(loss_l1), float(masked_mae(out, img, mask)),
                               rtol=1e-5)
    g_l1 = jax.grad(
        lambda o: fused_loss_metrics(o, img, mask, "l1", interpret=True)[0])(out)
    g_ref = jax.grad(lambda o: masked_mae(o, img, mask))(out)
    np.testing.assert_allclose(np.asarray(g_l1), np.asarray(g_ref), atol=1e-6)


def test_fused_gradients_mse(problem):
    out, img, mask = problem

    def f_pallas(o):
        return fused_loss_metrics(o, img, mask, "mse", interpret=True)[0]

    g_pallas = jax.grad(f_pallas)(out)
    g_ref = jax.grad(lambda o: masked_mse(o, img, mask))(out)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-6)


def test_fused_large_nonaligned(rng):
    # deliberately prime-ish sizes to exercise the padding path
    out = jnp.asarray(rng.randn(37, 41, 3).astype(np.float32))
    img = jnp.asarray(rng.randn(37, 41, 3).astype(np.float32))
    mask = jnp.ones_like(out)
    loss, m = fused_loss_metrics(out, img, mask, "mse", interpret=True)
    np.testing.assert_allclose(float(loss), float(masked_mse(out, img, mask)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["snr"]), float(snr(out, img)), rtol=1e-4)


def test_fused_loss_in_solver_matches_plain(lines_data):
    """cfg.fused_loss=True swaps the scanned step's loss/metrics onto the
    Pallas kernel; the optimisation trajectory must match the jnp path."""
    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.engine import DIPSolver

    img, mask = lines_data
    img, mask = img[:48, :32], mask[:48, :32]

    def solve(fused):
        cfg = Config(datadim="2d", epochs=10, inputdepth=4, filters=[8, 16],
                     skip=[4], scan_chunk=5, seed=0, fused_loss=fused)
        return DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)

    a, b = solve(False), solve(True)
    np.testing.assert_allclose(a.history.loss, b.history.loss, rtol=2e-4)
    np.testing.assert_allclose(a.history.snr, b.history.snr, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(a.out_best, b.out_best, rtol=1e-3, atol=1e-4)
