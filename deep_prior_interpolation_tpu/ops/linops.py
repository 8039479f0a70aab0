"""Adjoint-pair linear operators.

Capability parity with /root/reference/operators/: operator composition
``Chain`` (base.py:10-37), normal operator ``Hessian`` (base.py:40-50), the
dot-product adjoint test (base.py:53-67 — here returning the errors so it can
be *asserted*, not just printed), vertical finite-difference gradient with
true adjoint (derivative.py:8-21), wavelet convolution modelling
(signal.py:8-45) and Aki-Richards/Fatti AVO linearised modelling
(avo.py:9-95).

TPU-first: operators are ``(forward, adjoint)`` pure-function pairs wrapped
in a tiny :class:`LinearOperator`; :func:`auto_adjoint` derives the exact
adjoint of any forward with ``jax.linear_transpose`` — a capability the
reference implements by hand-deriving every adjoint.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LinearOperator:
    """A forward/adjoint pair. Callable as the forward map."""
    forward: Callable[[jnp.ndarray], jnp.ndarray]
    adjoint: Callable[[jnp.ndarray], jnp.ndarray]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.forward(x)

    def H(self, y: jnp.ndarray) -> jnp.ndarray:
        return self.adjoint(y)


def auto_adjoint(forward: Callable, example_input: jnp.ndarray) -> LinearOperator:
    """Exact adjoint via ``jax.linear_transpose`` (jax-native dottest-proof)."""
    transpose = jax.linear_transpose(forward, example_input)

    def adj(y):
        return transpose(y)[0]

    return LinearOperator(forward, adj)


def chain(ops: Sequence[LinearOperator]) -> LinearOperator:
    """Operator composition, applied left-to-right (base.py:10-37)."""
    assert len(ops) >= 1

    def fwd(x):
        for op in ops:
            x = op.forward(x)
        return x

    def adj(y):
        for op in reversed(ops):
            y = op.adjoint(y)
        return y

    return LinearOperator(fwd, adj)


def hessian(op: LinearOperator) -> LinearOperator:
    """Normal operator FᵀF — self-adjoint (base.py:40-50)."""
    def fwd(x):
        return op.adjoint(op.forward(x))
    return LinearOperator(fwd, fwd)


def dottest(op: LinearOperator, domain_shape, range_shape,
            key: Optional[jax.Array] = None,
            complex: bool = False) -> Tuple[float, float]:
    """⟨F d, r⟩ == ⟨d, Fᵀ r⟩ check; returns (abs_err, rel_err)
    (base.py:53-67, made assertable)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    d1 = jax.random.normal(k1, tuple(domain_shape))
    r1 = jax.random.normal(k2, tuple(range_shape))
    r2 = op.forward(d1)
    d2 = op.adjoint(r1)
    lhs = jnp.vdot(d1.ravel(), d2.ravel())
    rhs = jnp.vdot(r1.ravel(), r2.ravel())
    err_abs = float(jnp.abs(lhs - rhs))
    err_rel = float(jnp.abs((lhs - rhs) / lhs))
    return err_abs, err_rel


# ----------------------------------------------------------------------
# concrete operators
# ----------------------------------------------------------------------

def vertical_grad() -> LinearOperator:
    """Forward difference along the vertical (first spatial) axis of a
    (B, H, W, C) channels-last tensor, with its true adjoint
    (derivative.py:8-21; reference layout BCHW axis 2 == our axis 1)."""

    def fwd(x):
        y = jnp.zeros_like(x)
        return y.at[:, :-1].set(x[:, 1:] - x[:, :-1])

    def adj(y):
        x = jnp.zeros_like(y)
        x = x.at[:, :-1].add(-y[:, :-1])
        x = x.at[:, 1:].add(y[:, :-1])
        return x

    return LinearOperator(fwd, adj)


def vertical_conv(wavelet: np.ndarray) -> LinearOperator:
    """Convolution of each trace with a wavelet along the vertical axis of a
    (B, H, W, C) tensor: forward = true convolution with wavelet/2, adjoint =
    cross-correlation (signal.py:8-45). Per-channel independent (the
    reference loops channels through a 1-channel Conv2d; here it is one
    depthwise conv)."""
    from .filters import convolve_kernel_1d

    w = jnp.asarray(np.asarray(wavelet, np.float32) / 2.0)

    def fwd(x):
        # convolve_kernel_1d correlates with flip(taps) == convolution with taps
        return convolve_kernel_1d(x, w, axis=1)

    def adj(y):
        return convolve_kernel_1d(y, jnp.flip(w), axis=1)

    return LinearOperator(fwd, adj)


def _avo_coeffs(theta: jnp.ndarray, vsvp, n: int, linearization: str):
    """Aki-Richards / Fatti 3-term coefficients (avo.py:9-40)."""
    theta = jnp.deg2rad(jnp.asarray(theta, jnp.float32))
    vsvp = jnp.asarray(vsvp, jnp.float32)
    if vsvp.ndim == 0:
        vsvp = vsvp * jnp.ones((n,), jnp.float32)
    theta = theta[:, None]
    vsvp = vsvp[None, :]
    if linearization == "fatti":
        t2 = jnp.tan(theta) ** 2
        s2 = jnp.sin(theta) ** 2
        g1 = 0.5 * (1.0 + t2) + 0 * vsvp
        g2 = -4.0 * vsvp ** 2 * s2
        g3 = 0.5 * (4 * vsvp ** 2 * s2 - t2)
    else:  # akirich
        c2 = jnp.cos(theta) ** 2
        s2 = jnp.sin(theta) ** 2
        g1 = 1.0 / (2.0 * c2) + 0 * vsvp
        g2 = -4.0 * vsvp ** 2 * s2
        g3 = 0.5 - 2.0 * vsvp ** 2 * s2
    return jnp.stack([g1, g2, g3], axis=1)  # (ntheta, 3, nt0)


def avo_modelling(theta, vsvp=0.5, nt0: int = 1,
                  spatdims: Union[int, Tuple[int, ...], None] = None,
                  linearization: str = "akirich") -> LinearOperator:
    """AVO linearised modelling, 3 model channels -> ntheta data channels
    (avo.py:43-95). Channels-last: x is (1, nt0, *spatdims, 3), output
    (1, nt0, *spatdims, ntheta)."""
    vsvp_arr = jnp.asarray(vsvp, jnp.float32)
    n = int(vsvp_arr.shape[0]) if vsvp_arr.ndim > 0 else nt0
    G = _avo_coeffs(theta, vsvp, n, linearization)  # (ntheta, 3, nt0)
    nsp = 0 if spatdims is None else (
        len(spatdims) if isinstance(spatdims, tuple) else 1)
    # -> (nt0, *1s, 3, ntheta) for channels-last broadcasting
    Gt = jnp.transpose(G, (2, 1, 0)).reshape(
        (G.shape[2],) + (1,) * nsp + (3, G.shape[0]))

    def fwd(x):
        # (1, nt0, *sp, 3) x (nt0, *1s, 3, ntheta) -> sum over model channels
        return jnp.sum(x[..., :, None] * Gt, axis=-2)

    def adj(y):
        return jnp.sum(y[..., None, :] * Gt, axis=-1)

    return LinearOperator(fwd, adj)
