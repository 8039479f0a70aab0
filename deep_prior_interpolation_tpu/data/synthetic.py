"""Synthetic seismic volumes and masks.

The reference's 3D datasets (hyperbolic3d, wavelet.npy) are absent from its
tree (.MISSING_LARGE_BLOBS, SURVEY §2.1 #23); this module generates
equivalent synthetic data so the 3D workflows and benchmarks are
self-contained: hyperbolic diffraction events over a (t, x, y) grid, a
Ricker source wavelet, and random/regular trace-decimation masks (via
``ops.masks.build_mask``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.filters import ricker_wavelet
from ..ops.masks import build_mask


def hyperbolic_events(nt: int = 256, nx: int = 128, ny: Optional[int] = 128,
                      n_events: int = 6, sigma_t: float = 2.0,
                      seed: int = 0) -> np.ndarray:
    """(t, x[, y]) volume with hyperbolic moveout events, peak-normalised."""
    rng = np.random.RandomState(seed)
    is3d = ny is not None
    t = np.arange(nt, dtype=np.float32)
    x = (np.arange(nx, dtype=np.float32) - nx / 2)
    if is3d:
        t = t[:, None, None]
        xg = x[None, :, None]
        yg = (np.arange(ny, dtype=np.float32) - ny / 2)[None, None, :]
        r2 = xg ** 2 + yg ** 2
        vol = np.zeros((nt, nx, ny), np.float32)
    else:
        t = t[:, None]
        r2 = (x ** 2)[None, :]
        vol = np.zeros((nt, nx), np.float32)

    for _ in range(n_events):
        t0 = rng.uniform(0.1 * nt, 0.85 * nt)
        v = rng.uniform(2.0, 6.0)
        amp = rng.uniform(0.5, 1.0) * rng.choice([-1, 1])
        tt = np.sqrt(t0 ** 2 + r2 / (v * v))
        vol += amp * np.exp(-0.5 * ((t - tt) / sigma_t) ** 2)
    peak = np.abs(vol).max()
    return vol / peak if peak > 0 else vol


def source_wavelet(points: int = 51, a: float = 4.0) -> np.ndarray:
    """Ricker wavelet, for ``--filter_noise_with_wavelet`` (main.py:66-72)."""
    return np.asarray(ricker_wavelet(points, a), np.float32)


def decimated_pair(nt: int = 256, nx: int = 128, ny: Optional[int] = 128,
                   rate: float = 0.66, regular: bool = False,
                   seed: int = 0):
    """(volume, mask) pair with ``rate`` of the traces removed."""
    vol = hyperbolic_events(nt, nx, ny, seed=seed)
    mask = build_mask(vol, rate, regular=regular,
                      rng=np.random.default_rng(seed + 1)).astype(np.float32)
    return vol, mask
