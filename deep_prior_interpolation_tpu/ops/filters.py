"""Signal-processing ops: 1-D kernel filtering, Butterworth LPF design,
Gaussian/Ricker kernels, t-gain, finite differences.

Capability parity with /root/reference/utils/processing.py: sqrt-t gain
normalise/denormalise (processing.py:7-24), NaN->binary masks (:27-31), 1-D
kernel convolution along the time axis of BC[TXY] tensors (:34-67), the
Butterworth->FIR low-pass design (:70-79), Gaussian blur (:88-136), Ricker
wavelet (:101-109) and first/second finite-difference derivatives (:139-181).

TPU-first notes: the reference realises 1-D time-axis filtering as a dense
k^ndim conv_transpose kernel that is zero except for one line
(processing.py:52-61) — wasteful on any hardware. Here it is a genuinely 1-D
depthwise correlation applied along the chosen axis via
``lax.conv_general_dilated`` (identical output, O(k) instead of O(k^ndim)).
Filter *design* (scipy butter/firls) stays on host at setup time; only the
application is device code.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# masks and gain (processing.py:7-31)
# ----------------------------------------------------------------------

def bool2bin(x: np.ndarray, logic: bool = True) -> np.ndarray:
    """NaN-coded corrupted traces -> binary mask (processing.py:27-31)."""
    out = np.where(np.isnan(x), 0.0 if logic else 1.0, 1.0 if logic else 0.0)
    return out.astype(np.float32 if x.dtype.kind == "f" else x.dtype)


def _tgain(shape, time_step: float, velo: float) -> np.ndarray:
    nt = shape[0]
    step = time_step * velo
    t = np.linspace(step, nt * step, nt)
    gain = np.sqrt(t).reshape((nt,) + (1,) * (len(shape) - 1))
    return gain


def normalize(image: np.ndarray, time_step: float, velo: float) -> np.ndarray:
    """sqrt(t) gain along the leading time axis (processing.py:7-14)."""
    return image * _tgain(image.shape, time_step, velo)


def denormalize(image: np.ndarray, time_step: float, velo: float) -> np.ndarray:
    return image / _tgain(image.shape, time_step, velo)


# ----------------------------------------------------------------------
# 1-D kernel filtering along an axis (processing.py:34-67)
# ----------------------------------------------------------------------

def convolve_kernel_1d(x: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Filter ``x`` along ``axis`` with 1-D ``taps``, same-size output.

    Matches the reference ``ConvolveKernel_1d`` (conv_transpose with
    pad = len(taps)//2, which for stride 1 equals a correlation with the
    flipped kernel). ``x`` is channels-last with a leading batch dim.
    """
    taps = jnp.flip(taps)  # conv_transpose correlates with the flipped kernel
    width = taps.shape[0]
    pad = width // 2
    x = jnp.moveaxis(x, axis, -2)
    lead = x.shape[:-2]
    L, C = x.shape[-2], x.shape[-1]
    xr = x.reshape((-1, L, C))
    kern = jnp.tile(taps.astype(x.dtype)[:, None, None], (1, 1, C))
    y = jax.lax.conv_general_dilated(
        xr, kern, window_strides=(1,), padding=[(pad, width - 1 - pad)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C)
    y = y.reshape(lead + (L, C))
    return jnp.moveaxis(y, -2, axis)


def lowpass_butterworth_taps(fc: float, fs: Optional[float] = None,
                             ntaps: int = 101, order: int = 2,
                             nfft: int = 1024) -> np.ndarray:
    """FIR taps matching a Butterworth magnitude response (processing.py:70-79)."""
    from scipy.signal import butter, firls, freqz
    b, a = butter(order, fc, fs=fs, btype="low", analog=False)
    w_iir, h_iir = freqz(b, a, worN=nfft, fs=fs)
    return firls(ntaps, w_iir, np.abs(h_iir), fs=fs).astype(np.float32)


# ----------------------------------------------------------------------
# kernels (processing.py:88-136)
# ----------------------------------------------------------------------

def gaussian_kernel(m: int, std: float, sym: bool = True) -> jnp.ndarray:
    """1-D Gaussian window (processing.py:88-98)."""
    assert m > 1
    odd = m % 2
    mm = m if (sym or odd) else m + 1
    n = jnp.arange(0, mm) - (mm - 1.0) / 2.0
    w = jnp.exp(-(n ** 2) / (2 * std * std))
    return w if (sym or odd) else w[:-1]


def ricker_wavelet(points: int, a: float) -> jnp.ndarray:
    """Ricker (mexican-hat) wavelet (processing.py:101-109)."""
    A = 2 / (np.sqrt(3 * a) * (np.pi ** 0.25))
    vec = jnp.arange(0, points) - (points - 1.0) / 2
    xsq = vec ** 2
    wsq = a ** 2
    return A * (1 - xsq / wsq) * jnp.exp(-xsq / (2 * wsq))


def gaussian_filter(x: jnp.ndarray, kernel_size: int, std: float) -> jnp.ndarray:
    """Separable isotropic Gaussian blur over the spatial axes
    (processing.py:112-136; separable instead of a dense ndim kernel)."""
    w = gaussian_kernel(kernel_size, std).astype(x.dtype)
    for ax in range(1, x.ndim - 1):
        x = convolve_kernel_1d(x, w, axis=ax)
    return x


# ----------------------------------------------------------------------
# finite differences (processing.py:139-181)
# ----------------------------------------------------------------------

def first_derivative(x: jnp.ndarray, spacing: float = 1.0, axis: int = 0,
                     stencil: str = "forward") -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, 0)
    g = jnp.zeros_like(x)
    if stencil == "centered":
        g = g.at[1:-1].set((0.5 * x[2:] - 0.5 * x[:-2]) / spacing)
    elif stencil == "forward":
        g = g.at[:-1].set((x[1:] - x[:-1]) / spacing)
    elif stencil == "backward":
        g = g.at[1:].set((x[1:] - x[:-1]) / spacing)
    else:
        raise ValueError("Stencil has to be centered, forward or backward")
    return jnp.moveaxis(g, 0, axis)


def second_derivative(x: jnp.ndarray, spacing: float = 1.0,
                      axis: int = 0) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, 0)
    g = jnp.zeros_like(x)
    g = g.at[1:-1].set((x[2:] - 2 * x[1:-1] + x[:-2]) / spacing ** 2)
    return jnp.moveaxis(g, 0, axis)
