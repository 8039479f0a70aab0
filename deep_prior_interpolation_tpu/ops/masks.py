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
    """Binary trace mask over (t, x[, y]) with ``rate`` missing traces."""
    if data.ndim == 2:
        nt, nx = data.shape
        ny = 1
        flat = data
    elif data.ndim == 3:
        nt, nx, ny = data.shape
        flat = data.reshape((nt, -1))
    else:
        raise ValueError("data volume has to be either 2D or 3D")

    num_traces = nx * ny
    num_deletion = int(num_traces * rate)

    if regular:
        if rate >= 0.5:
            mask = np.ones_like(flat)
            remain = num_traces - num_deletion
            m = int(np.ceil(num_traces / remain))
            for i in range(remain):
                mask[:, i * m + 1:i * m + m] = 0
        else:
            mask = np.zeros_like(flat)
            remain = num_deletion
            m = int(np.ceil(num_traces / remain))
            for i in range(remain):
                mask[:, i * m + 1:i * m + m] = 1
    else:
        rng = rng or np.random.default_rng()
        del_idx = rng.choice(np.arange(num_traces), num_deletion, replace=False)
        mask = np.ones_like(flat)
        mask[:, del_idx] = 0

    return mask.reshape((nt, nx, ny)).squeeze()


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
