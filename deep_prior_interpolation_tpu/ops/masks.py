"""Trace-decimation mask synthesis and progressive mask growth.

Capability parity with /root/reference/utils/mask.py: random/regular
trace-deletion masks (``build_mask``, mask.py:6-53), additional random trace
deletion (``add_rand_mask``, :56-75), and the experimental dilation-based
progressive mask schedule (``MaskUpdate``, :78-116) rebuilt on
scipy.ndimage + jax (the reference needs OpenCV and torch dropout).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from scipy.ndimage import grey_dilation


def build_mask(data: np.ndarray, rate: float, regular: bool = False,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Binary trace mask over (t, x[, y]) with ``rate`` missing traces.

    Behavioural parity with the reference's mask synthesis
    (/root/reference/utils/mask.py:6-53), vectorised over the trace axis
    (whole columns of constant time are kept or dropped together):

    * ``regular``: an every-``p``-th comb, where ``p = ceil(n / anchors)``.
      For ``rate >= 0.5`` the anchors are the SURVIVORS (trace 0, p, 2p, …
      kept, everything between them dropped); for ``rate < 0.5`` the anchors
      are the VICTIMS (trace 0, p, 2p, … dropped). Traces beyond the last
      full comb period keep the background value (kept resp. dropped) —
      pinned by tests/test_data.py::test_build_mask_golden.
    * random: ``rate * n`` distinct traces drawn from ``rng`` are dropped.
    """
    if data.ndim == 2:
        nt = data.shape[0]
        trace_grid = (data.shape[1], 1)
    elif data.ndim == 3:
        nt = data.shape[0]
        trace_grid = data.shape[1:]
    else:
        raise ValueError("data volume has to be either 2D or 3D")

    n = int(np.prod(trace_grid))
    n_drop = int(n * rate)
    col = np.arange(n)

    if regular:
        anchors = (n - n_drop) if rate >= 0.5 else n_drop
        period = -(-n // anchors)  # ceil
        combed = (col < anchors * period) & (col % period != 0)
        if rate >= 0.5:
            keep = ~combed          # anchors survive, the comb drops
        else:
            keep = combed           # anchors drop, the comb survives
    else:
        rng = rng or np.random.default_rng()
        dropped = rng.choice(np.arange(n), n_drop, replace=False)
        keep = np.ones(n, bool)
        keep[dropped] = False

    trace_mask = keep.astype(data.dtype)
    return np.broadcast_to(trace_mask, (nt, n)).reshape(
        (nt,) + trace_grid).squeeze().copy()


def add_rand_mask(mask: np.ndarray, perc: float = 0.3,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Delete an extra ``perc`` of the surviving traces (mask.py:56-75)."""
    m = mask.copy()
    points = np.argwhere(m[0] == 1)
    rng = rng or np.random.default_rng()
    rr = rng.choice(np.arange(points.shape[0]), int(points.shape[0] * perc),
                    replace=False)
    for p in points[rr]:
        m[(slice(None),) + tuple(p)] = 0
    return m


def dilate_mask(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """Grow the mask with a 2x2 structuring element per leading slice
    (parity: mask.py:78-91, cv2.dilate on each mask[i])."""
    shape = mask.shape
    m = np.asarray(mask).squeeze()
    out = np.empty_like(m)
    for i in range(m.shape[0]):
        s = m[i]
        for _ in range(iterations):
            s = grey_dilation(s, footprint=np.ones((2, 2)), mode="constant")
        out[i] = s
    return out.reshape(shape).astype(mask.dtype)


class MaskUpdate:
    """Progressive mask growth schedule (parity: mask.py:94-116)."""

    def __init__(self, mask: np.ndarray, threshold: int, step: int,
                 rng: Optional[np.random.Generator] = None) -> None:
        self.threshold = threshold
        self.step = step
        self.iter = 0
        self.new_mask = np.asarray(mask)
        self.old_mask = np.asarray(mask)
        self.rng = rng or np.random.default_rng()

    def update(self, iiter: int) -> np.ndarray:
        mask_return = self.old_mask
        if iiter > self.threshold:
            iiter_dil = (iiter - self.threshold) // self.step + 1
            if iiter_dil > self.iter:
                self.old_mask = self.new_mask
                self.new_mask = dilate_mask(self.old_mask)
                self.iter = iiter_dil
            iter_drop = (iiter - self.threshold) % self.step
            p = 1.0 - 1.0 / self.step * (iter_drop + 1)
            diff = self.new_mask - self.old_mask
            keep = (self.rng.random(diff.shape) >= p) & (diff != 0)
            mask_return = self.old_mask + keep.astype(self.old_mask.dtype)
        return mask_return
