"""opt_over='net,input' — joint optimisation of the input noise tensor
(parity: get_params, utils/torch.py:138-162) — plus synthetic data and the
extra resampling kernels."""
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.data import (decimated_pair,
                                               hyperbolic_events,
                                               source_wavelet)
from deep_prior_interpolation_tpu.engine import DIPSolver
from deep_prior_interpolation_tpu.models.blocks import (resample_kernel_1d,
                                                        symmetry)


def test_opt_input_runs_and_improves(rng):
    t = np.linspace(0, 1, 24)[:, None]
    x = np.linspace(0, 1, 16)[None, :]
    img = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)[..., None]
    mask = np.repeat((rng.rand(1, 16) > 0.5).astype(np.float32), 24, 0)[..., None]
    cfg = Config(datadim="2d", epochs=30, inputdepth=4, filters=[8, 16],
                 skip=[4], scan_chunk=10, gain=1.0, opt_over="net,input")
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    assert res.iters_run == 30
    assert res.history.loss[-1] < res.history.loss[0]
    # transfer params are still the NET params only
    assert "net" not in res.params  # res.params IS the net pytree


def test_synthetic_volumes():
    vol2 = hyperbolic_events(32, 16, None, n_events=3)
    assert vol2.shape == (32, 16)
    vol3, mask = decimated_pair(16, 12, 10, rate=0.5)
    assert vol3.shape == (16, 12, 10) and mask.shape == vol3.shape
    assert np.abs(vol3).max() == pytest.approx(1.0)
    # whole traces removed, constant along t
    assert np.all(mask.min(axis=0) == mask.max(axis=0))
    w = source_wavelet(21, 3.0)
    assert w.shape == (21,) and w[10] == w.max()


def test_symmetry():
    x = np.arange(16.0).reshape(1, 4, 4, 1)
    y = np.asarray(symmetry(x))
    np.testing.assert_allclose(y[0, :, :, 0], y[0, :, :, 0].T)


def test_resample_kernels():
    for kt in ["lanczos2", "lanczos3", "box", "gauss"]:
        k = np.asarray(resample_kernel_1d(2, kt))
        assert k.sum() == pytest.approx(1.0, abs=1e-5)
    with pytest.raises(ValueError):
        resample_kernel_1d(2, "nope")


def test_layout_converters(rng):
    from deep_prior_interpolation_tpu.utils import (batch_channel_add,
                                                    batch_channel_del,
                                                    nchw_to_nhwc,
                                                    nhwc_to_nchw,
                                                    to_channels_first,
                                                    to_channels_last)
    x = rng.randn(3, 8, 9).astype(np.float32)  # (C, H, W)
    np.testing.assert_array_equal(to_channels_first(to_channels_last(x)), x)
    b = rng.randn(2, 3, 8, 9).astype(np.float32)
    np.testing.assert_array_equal(nhwc_to_nchw(nchw_to_nhwc(b)), b)
    v = rng.randn(8, 9).astype(np.float32)
    np.testing.assert_array_equal(batch_channel_del(batch_channel_add(v)), v)


def test_virtual_input_matches_materialized(rng):
    """virtual_input regenerates the canvas from the same key -> identical
    trajectory to the materialized-canvas path."""
    import jax
    from deep_prior_interpolation_tpu.engine import DIPSolver

    t = np.linspace(0, 1, 24)[:, None]
    x = np.linspace(0, 1, 16)[None, :]
    img = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)[..., None]
    mask = np.repeat((rng.rand(1, 16) > 0.5).astype(np.float32), 24, 0)[..., None]

    base = dict(datadim="2d", epochs=10, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=5, gain=1.0)
    key = jax.random.PRNGKey(7)
    r_mat = DIPSolver(Config(**base, virtual_input=False), 1).solve(
        img, mask, key=key)
    r_vir = DIPSolver(Config(**base, virtual_input=True), 1).solve(
        img, mask, key=key)
    # identical canvas -> identical first-chunk losses; later iterations
    # accumulate fp fusion-order noise through the chaotic DIP trajectory
    np.testing.assert_allclose(r_vir.history.loss[:5], r_mat.history.loss[:5],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(r_vir.history.loss[5:], r_mat.history.loss[5:],
                               rtol=0.15, atol=1e-3)
