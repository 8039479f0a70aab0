"""POCS (projection onto convex sets) spectral projection.

Capability parity with /root/reference/utils/pocs.py: hard threshold in the
transform domain (pocs.py:5-19), the one-shot f-k projection ``pocs_fk_fn``
(pocs.py:22-41) and the ``POCS`` re-insertion operator (pocs.py:44-79) used by
the DIP+POCS driver (main_pocs.py:151-158).

The reference uses the legacy ``torch.rfft(..., onesided=False)`` which
returns the full complex spectrum as a stacked (real, imag) float tensor and
thresholds the two components independently, with the threshold computed from
the max over both components. We reproduce exactly that semantics on
``jnp.fft.fftn`` complex arrays.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def _component_threshold(x: jnp.ndarray, thresh) -> jnp.ndarray:
    """Hard threshold keeping |x| > thresh, per real component (pocs.py:5-15)."""
    keep = (x > thresh).astype(x.dtype) + (x < -thresh).astype(x.dtype)
    return x * keep


def threshold(spec: jnp.ndarray, thresh=None) -> jnp.ndarray:
    """Hard-threshold a real or complex array (complex = per component)."""
    if thresh is None:
        thresh = compute_threshold(spec)
    if jnp.iscomplexobj(spec):
        return (_component_threshold(spec.real, thresh)
                + 1j * _component_threshold(spec.imag, thresh))
    return _component_threshold(spec, thresh)


def compute_threshold(spec: jnp.ndarray, perc: float = 10.0):
    """max(spec) * perc/100 over all real components (pocs.py:18-19)."""
    if jnp.iscomplexobj(spec):
        m = jnp.maximum(jnp.max(spec.real), jnp.max(spec.imag))
    else:
        m = jnp.max(spec)
    return m * perc / 100.0


def fk_projection(x: jnp.ndarray, weighted_data: jnp.ndarray,
                  weighted_mask: jnp.ndarray, thresh_perc: float,
                  axes: Optional[Sequence[int]] = None,
                  return_threshold: bool = False):
    """One POCS iteration: FFT -> threshold -> IFFT -> data re-insertion.

    ``weighted_data = alpha * data`` and ``weighted_mask = 1 - alpha * mask``
    are precomputed by the caller (parity: pocs.py:59-60,74-79). ``axes``
    defaults to all but the first (batch) and last (channel) axis,
    matching the reference's spatial-only transform (main_pocs.py:156-157).
    """
    if axes is None:
        axes = tuple(range(1, x.ndim - 1))
    spec = jnp.fft.fftn(x, axes=tuple(axes))
    th = compute_threshold(spec, thresh_perc)
    spec = threshold(spec, th)
    proj = jnp.fft.ifftn(spec, axes=tuple(axes)).real.astype(x.dtype)
    out = weighted_data + weighted_mask * proj
    if return_threshold:
        return out, th
    return out


def pocs_fk_fn(out: jnp.ndarray, data: jnp.ndarray, mask: jnp.ndarray,
               th: float, alp: float = 0.2,
               axes: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """One-shot functional POCS step (parity: pocs.py:22-41)."""
    if axes is None:
        axes = tuple(range(out.ndim))
    spec = jnp.fft.fftn(out, axes=tuple(axes))
    spec = threshold(spec, th)
    proj = jnp.fft.ifftn(spec, axes=tuple(axes)).real.astype(out.dtype)
    return alp * data + proj * (1 - alp * mask)


class POCS:
    """Stateful POCS projector (parity: pocs.py:44-79).

    ``forward_fn``/``adjoint_fn`` default to the spatial full FFT pair the
    reference wires in at main_pocs.py:156-157.
    """

    def __init__(self, data: jnp.ndarray, mask: jnp.ndarray, weight: float,
                 forward_fn=None, adjoint_fn=None,
                 thresh_perc: Optional[float] = None):
        self.weighted_data = weight * data
        self.weighted_mask = jnp.ones_like(mask) - weight * mask
        self.weight = weight
        axes = tuple(range(1, data.ndim - 1))
        self.forward_fn = forward_fn or (lambda x: jnp.fft.fftn(x, axes=axes))
        self.adjoint_fn = adjoint_fn or (
            lambda s: jnp.fft.ifftn(s, axes=axes).real.astype(data.dtype))
        self.thresh_perc = thresh_perc

    def __call__(self, x: jnp.ndarray, thresh=None) -> jnp.ndarray:
        spec = self.forward_fn(x)
        th = (compute_threshold(spec, self.thresh_perc)
              if self.thresh_perc is not None else thresh)
        spec = threshold(spec, th)
        proj = self.adjoint_fn(spec)
        return self.weighted_data + self.weighted_mask * proj

    def __repr__(self) -> str:
        return f"POCS(weight={self.weight:.3f})"
