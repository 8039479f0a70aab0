"""Local-dip estimation and slope-regularisation operators.

Capability parity with /root/reference/utils/slopes.py: structure-tensor
local dip + anisotropy (slopes.py:6-48, van Vliet & Verbeek 1995),
directional Laplacian (slopes.py:51-69) and its precomputed-direction form
``Hale2D`` (slopes.py:72-105). Channels-last (B, H, W, C) layout; the
vertical axis is axis 1 (the reference's BCHW axis 2).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .filters import first_derivative, gaussian_filter


def structure_tensor_dips(x: jnp.ndarray, dv: float = 1.0, dh: float = 1.0,
                          smooth: float = 0.0
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local dip angle and anisotropy of a (B, H, W, C) tensor."""
    gv = first_derivative(x, spacing=dv, axis=1, stencil="forward")
    gh = first_derivative(x, spacing=dh, axis=2, stencil="forward")
    gvv, gvh, ghh = gv * gv, gv * gh, gh * gh

    if smooth > 0:
        ks = 2 * min(x.shape[1], x.shape[2]) // 2 + 1
        gvv = gaussian_filter(gvv, ks, smooth)
        gvh = gaussian_filter(gvh, ks, smooth)
        ghh = gaussian_filter(ghh, ks, smooth)

    term1 = 0.5 * (gvv + ghh)
    term2 = 0.5 * jnp.sqrt((gvv - ghh) ** 2 + 4 * gvh ** 2)
    eig1 = term1 + term2
    eig2 = term1 - term2

    phi1 = jnp.arctan((eig1 - gvv) / gvh)
    phi1 = jnp.nan_to_num(phi1, nan=0.0)
    anisotropy = 1 - eig2 / eig1
    return phi1, anisotropy


def directional_laplacian(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic Laplacian steered by dip field ``theta`` (slopes.py:51-69)."""
    u1 = jnp.cos(theta)
    u2 = -jnp.sin(theta)
    grad_v = first_derivative(x, axis=1, stencil="forward")
    grad_h = first_derivative(x, axis=2, stencil="forward")
    r1 = u1 * u1 * grad_v + u1 * u2 * grad_h
    r2 = u1 * u2 * grad_v + u2 * u2 * grad_h
    ata = (first_derivative(r1, axis=2, stencil="forward")
           + first_derivative(r2, axis=1, stencil="forward"))
    return -ata


class Hale2D:
    """Directional Laplacian with precomputed rotation (slopes.py:72-105)."""

    def __init__(self, directions: jnp.ndarray):
        u1 = jnp.cos(directions)
        u2 = -jnp.sin(directions)
        self.a = u1 * u1
        self.b = u1 * u2
        self.c = u2 * u2
        self.dips = directions

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        grad_v = first_derivative(x, axis=1, stencil="forward")
        grad_h = first_derivative(x, axis=2, stencil="forward")
        r1 = self.a * grad_v + self.b * grad_h
        r2 = self.b * grad_v + self.c * grad_h
        return -(first_derivative(r1, axis=2, stencil="forward")
                 + first_derivative(r2, axis=1, stencil="forward"))
