"""Unit tests for the ops library: losses, metrics, noise, POCS, filters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.ops import (
    bool2bin, compute_threshold, convolve_kernel_1d, fk_projection,
    get_loss_fn, get_noise, masked_mae, masked_mse, mse, pcorr, pocs_fk_fn,
    snr, threshold)
from deep_prior_interpolation_tpu.ops.filters import (
    first_derivative, gaussian_kernel, lowpass_butterworth_taps,
    ricker_wavelet, second_derivative, normalize, denormalize)
from deep_prior_interpolation_tpu.ops.noise import (
    build_forgetting_data, data_forgetting_weights)


def test_masked_losses_match_reference_semantics(rng):
    # reference computes mean over ALL elements of (out-img)*mask (main.py:161)
    out = rng.randn(7, 5).astype(np.float32)
    img = rng.randn(7, 5).astype(np.float32)
    mask = (rng.rand(7, 5) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        masked_mae(out, img, mask), np.mean(np.abs((out - img) * mask)), rtol=1e-6)
    np.testing.assert_allclose(
        masked_mse(out, img, mask), np.mean(((out - img) * mask) ** 2), rtol=1e-6)
    assert get_loss_fn("mae") is masked_mae
    assert get_loss_fn("mse") is masked_mse


def test_snr_pcorr(rng):
    t = rng.randn(64, 32).astype(np.float32)
    assert float(snr(t, t)) == np.inf or float(snr(t, t)) > 100
    o = t + 0.1 * rng.randn(64, 32).astype(np.float32)
    s = float(snr(o, t))
    ref = 10 * np.log10(np.sum(t ** 2) / np.sum((t - o) ** 2))
    np.testing.assert_allclose(s, ref, rtol=1e-4)
    p = float(pcorr(o, t))
    ref_p = np.corrcoef(o.ravel(), t.ravel())[0, 1]
    np.testing.assert_allclose(p, ref_p, rtol=1e-4)


def test_noise_statistics():
    key = jax.random.PRNGKey(0)
    for dist, (lo, hi) in [("n", (-0.2, 0.2)), ("u", (0.45, 0.55))]:
        x = get_noise(key, (10000,), dist)
        assert lo < float(jnp.mean(x)) < hi
    c = get_noise(key, (10000,), "c")
    # Cauchy: heavy tails, median ~ 0
    assert abs(float(jnp.median(c))) < 0.1
    with pytest.raises(ValueError):
        get_noise(key, (4,), "z")


def test_forgetting_schedule():
    w = data_forgetting_weights(10)
    assert w.shape == (10,) and w[0] == 1.0
    np.testing.assert_allclose(w[-1], 1e-4, rtol=1e-5)
    img = jnp.ones((4, 4, 3))
    fd = build_forgetting_data(img, 7)
    assert fd.shape == (4, 4, 7)


def test_threshold_complex_matches_component_semantics():
    # reference thresholds the stacked (re, im) representation per component
    spec = jnp.array([3 + 0.1j, -3 - 5j, 0.5 + 0.2j])
    out = threshold(spec, 1.0)
    np.testing.assert_allclose(np.asarray(out), [3 + 0j, -3 - 5j, 0j], atol=1e-6)
    th = compute_threshold(jnp.array([1 + 9j, 2 + 0j]), perc=10.0)
    np.testing.assert_allclose(float(th), 0.9, rtol=1e-6)


def test_fk_projection_reinsertion():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 16, 8, 1))
    data = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8, 1))
    mask = jnp.ones((1, 16, 8, 1))
    alpha = 0.3
    # with an enormous threshold everything is zeroed -> pure re-insertion
    proj = fk_projection(x, alpha * data, 1 - alpha * mask, thresh_perc=1e9)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(alpha * data),
                               atol=1e-5)
    # with zero threshold the projection is an identity FFT roundtrip
    proj = fk_projection(x, 0.0 * data, jnp.ones_like(mask), thresh_perc=0.0)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(x), atol=1e-4)


def test_pocs_fk_fn_runs():
    x = jnp.ones((8, 8))
    out = pocs_fk_fn(x, x, jnp.ones_like(x), th=0.0, alp=0.2)
    assert out.shape == (8, 8)


def test_bool2bin():
    x = np.array([[1.0, np.nan], [3.0, np.nan]])
    np.testing.assert_array_equal(bool2bin(x), [[1, 0], [1, 0]])
    np.testing.assert_array_equal(bool2bin(x, logic=False), [[0, 1], [0, 1]])


def test_convolve_kernel_1d_matches_numpy(rng):
    from scipy.ndimage import convolve1d
    x = rng.randn(1, 32, 5, 2).astype(np.float32)
    taps = rng.randn(7).astype(np.float32)
    y = convolve_kernel_1d(jnp.asarray(x), jnp.asarray(taps), axis=1)
    # reference uses conv_transpose with pad k//2 == full correlation with
    # flipped kernel == scipy convolve1d with zero-padded boundaries
    ref = convolve1d(x, taps, axis=1, mode="constant")
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_butterworth_taps_lowpass():
    taps = lowpass_butterworth_taps(fc=20.0, fs=200.0, ntaps=31, order=4)
    assert taps.shape == (31,)
    H = np.abs(np.fft.rfft(taps, 512))
    f = np.fft.rfftfreq(512, d=1 / 200.0)
    assert H[f < 10].mean() > 5 * H[f > 60].mean()  # passband >> stopband


def test_kernels_and_derivatives(rng):
    g = gaussian_kernel(9, 2.0)
    assert g.shape == (9,) and float(g[4]) == pytest.approx(1.0)
    r = ricker_wavelet(33, 4.0)
    assert float(jnp.argmax(r)) == 16
    x = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    d = first_derivative(x, axis=0, stencil="forward")
    np.testing.assert_allclose(np.asarray(d[:-1]), np.diff(np.asarray(x), axis=0),
                               atol=1e-6)
    d2 = second_derivative(x, axis=0)
    assert d2.shape == x.shape


def test_tgain_roundtrip(rng):
    x = rng.randn(16, 4, 3).astype(np.float32)
    y = denormalize(normalize(x, 0.004, 1500.0), 0.004, 1500.0)
    np.testing.assert_allclose(y, x, rtol=1e-5)
