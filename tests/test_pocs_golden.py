"""Cross-implementation golden for the POCS projection.

The reference POCS path (utils/pocs.py:22-79 wired at main_pocs.py:151-158)
runs on the legacy ``torch.rfft(x, ndim, onesided=False)`` API, which returns
the FULL complex spectrum as a float tensor with a trailing (real, imag)
component axis, hard-thresholds that stacked-real tensor per component
(utils/pocs.py:5-15), computes the threshold as ``max * perc/100`` over BOTH
components at once (utils/pocs.py:18-19), inverts with
``torch.irfft(onesided=False)``, and re-inserts the observed traces
(utils/pocs.py:74-79).

Our ``ops/pocs.py`` reproduces those semantics on complex ``jnp.fft`` arrays.
These tests validate it number-for-number against an INDEPENDENT numpy
re-implementation written in the legacy stacked-component layout — the same
data representation the removed torch API used, exercised on realistic
(decimated hyperbolic-event) spectra where real and imag maxima differ.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from deep_prior_interpolation_tpu.ops import pocs as jpocs


# ---------------------------------------------------------------------------
# independent numpy reference, legacy stacked-(real, imag) layout
# ---------------------------------------------------------------------------

def _legacy_rfft(x: np.ndarray, axes) -> np.ndarray:
    """Full spectrum as float stack: shape (*x.shape, 2), [..., 0]=re."""
    spec = np.fft.fftn(x.astype(np.float64), axes=axes)
    return np.stack([spec.real, spec.imag], axis=-1)


def _legacy_irfft(stacked: np.ndarray, axes) -> np.ndarray:
    spec = stacked[..., 0] + 1j * stacked[..., 1]
    return np.fft.ifftn(spec, axes=axes).real


def _legacy_threshold(stacked: np.ndarray, th: float) -> np.ndarray:
    keep = (stacked > th) | (stacked < -th)
    return stacked * keep


def _legacy_compute_threshold(stacked: np.ndarray, perc: float) -> float:
    return float(stacked.max() * perc / 100.0)


def legacy_pocs_apply(x, data, mask, weight, perc, axes):
    """One reference POCS.forward (utils/pocs.py:74-79) in legacy layout."""
    stacked = _legacy_rfft(x, axes)
    th = _legacy_compute_threshold(stacked, perc)
    proj = _legacy_irfft(_legacy_threshold(stacked, th), axes)
    return weight * data + (1.0 - weight * mask) * proj, th


def legacy_pocs_fk(out, data, mask, th, alp, axes):
    """One reference pocs_fk_fn torch branch (utils/pocs.py:27-40)."""
    proj = _legacy_irfft(_legacy_threshold(_legacy_rfft(out, axes), th), axes)
    return alp * data + proj * (1.0 - alp * mask)


# ---------------------------------------------------------------------------
# fixtures: realistic decimated seismic-like volumes
# ---------------------------------------------------------------------------

def _problem(ndim: int, seed: int = 0):
    from deep_prior_interpolation_tpu.data import hyperbolic_events

    rng = np.random.RandomState(seed)
    if ndim == 2:
        full = hyperbolic_events(48, 32, 8, seed=seed)[..., 4]
        keep = (rng.rand(1, 32) > 0.5).astype(np.float32)
        mask = np.broadcast_to(keep, full.shape).copy()
    else:
        full = hyperbolic_events(24, 16, 12, seed=seed)
        keep = (rng.rand(1, 16, 12) > 0.5).astype(np.float32)
        mask = np.broadcast_to(keep, full.shape).copy()
    img = (full * mask).astype(np.float32)[None, ..., None]
    mask = mask.astype(np.float32)[None, ..., None]
    # current network output: corrupted data + smooth-ish error
    x = img + 0.1 * rng.randn(*img.shape).astype(np.float32)
    axes = tuple(range(1, img.ndim - 1))
    return x, img, mask, axes


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("perc", [1.0, 10.0, 60.0])
def test_pocs_apply_matches_legacy(ndim, perc):
    x, img, mask, axes = _problem(ndim)
    want, th_want = legacy_pocs_apply(
        np.asarray(x, np.float64), np.asarray(img, np.float64),
        np.asarray(mask, np.float64), weight=0.2, perc=perc, axes=axes)

    proj = jpocs.POCS(jnp.asarray(img), jnp.asarray(mask), weight=0.2,
                      thresh_perc=perc)
    got = np.asarray(proj(jnp.asarray(x)), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # and the threshold itself (max over BOTH spectrum components)
    spec = jnp.fft.fftn(jnp.asarray(x), axes=axes)
    th_got = float(jpocs.compute_threshold(spec, perc))
    assert th_got == pytest.approx(th_want, rel=1e-5)


@pytest.mark.parametrize("ndim", [2, 3])
def test_fk_projection_matches_legacy(ndim):
    x, img, mask, axes = _problem(ndim, seed=3)
    alpha = 0.3
    perc = 10.0
    want, _ = legacy_pocs_apply(
        np.asarray(x, np.float64), np.asarray(img, np.float64),
        np.asarray(mask, np.float64), weight=alpha, perc=perc, axes=axes)
    got = jpocs.fk_projection(jnp.asarray(x), alpha * jnp.asarray(img),
                              1.0 - alpha * jnp.asarray(mask),
                              thresh_perc=perc, axes=axes)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-4, atol=2e-5)


def test_pocs_fk_fn_matches_legacy_torch_branch():
    x, img, mask, _ = _problem(2, seed=5)
    x, img, mask = x[0, ..., 0], img[0, ..., 0], mask[0, ..., 0]
    axes = (0, 1)
    th = 0.05 * float(np.abs(np.fft.fftn(x)).max())
    want = legacy_pocs_fk(np.asarray(x, np.float64),
                          np.asarray(img, np.float64),
                          np.asarray(mask, np.float64), th, 0.2, axes)
    got = jpocs.pocs_fk_fn(jnp.asarray(x), jnp.asarray(img),
                           jnp.asarray(mask), th=th, alp=0.2, axes=axes)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-4, atol=2e-5)


def test_component_threshold_is_not_magnitude_threshold():
    """Pin the quirk: the legacy path thresholds re/im independently, so a
    coefficient with |z| > th can still be zeroed component-wise. A magnitude
    implementation would diverge on exactly this input."""
    z = jnp.asarray([[3.0 + 3.0j, 0.5 + 4.9j, 4.0 + 0.0j]])
    out = np.asarray(jpocs.threshold(z, 4.5))
    np.testing.assert_allclose(out, [[0.0 + 0.0j, 0.0 + 4.9j, 0.0 + 0.0j]])


# ---------------------------------------------------------------------------
# behavioral: a short DIP+POCS solve produces the reference trace shapes
# ---------------------------------------------------------------------------

def test_dip_pocs_traces_behave(rng):
    """main_pocs.py:177-195 semantics: adaptive eps = main/reg is positive
    and finite, the recorded threshold follows compute_threshold of the
    CURRENT output spectrum, and the regularisation loss trends down."""
    from deep_prior_interpolation_tpu import Config, DIPSolver

    x, img, mask, axes = _problem(2, seed=7)
    cfg = Config(datadim="2d", epochs=40, scan_chunk=10, inputdepth=4,
                 filters=[8, 16], skip=[4], pocs=True, pocs_alpha=0.2,
                 pocs_thresh=5.0, gain=1.0)
    solver = DIPSolver(cfg, outchannel=1)
    res = solver.solve(img[0], mask[0], seed=0)

    eps = np.asarray(res.history.eps)
    reg = np.asarray(res.history.reg)
    th = np.asarray(res.history.th)
    assert np.all(np.isfinite(eps)) and np.all(eps > 0)
    assert np.all(np.isfinite(th)) and np.all(th > 0)
    # the projection target follows the output: late reg residual below the
    # early mean (self-distillation converges toward the POCS fixed point)
    assert reg[-5:].mean() < reg[:5].mean()
