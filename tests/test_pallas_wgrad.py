"""Pallas wgrad kernel (ops/pallas_wgrad.py): exactness vs jax.grad.

Interpret mode on the CPU test backend; the same kernel compiles via Mosaic
on TPU. Pins the tap ordering (t0,t1,t2 row-major = DHWIO kernel layout),
the padded depth-slab pairing, and the conv_same integration gate.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from deep_prior_interpolation_tpu.ops import conv_vjp
from deep_prior_interpolation_tpu.ops.conv_vjp import conv_same
from deep_prior_interpolation_tpu.ops.pallas_wgrad import (pallas_wgrad_s1,
                                                           wgrad_supported)


def _baseline(x, w, stride, pads):
    d = w.ndim - 2
    return lax.conv_general_dilated(
        x, w, (stride,) * d, list(pads),
        dimension_numbers=conv_vjp._dn(d), preferred_element_type=x.dtype)


@pytest.mark.parametrize("sp,k,ci,co", [
    ((6, 8, 16), 3, 5, 3),     # generic odd channels
    ((4, 8, 8), 3, 8, 4),      # small cube
    ((5, 16, 8), 5, 3, 2),     # k=5
])
def test_pallas_wgrad_matches_autodiff(sp, k, ci, co):
    kx, kw, kc = jax.random.split(jax.random.PRNGKey(11), 3)
    p = (k - 1) // 2
    pads = ((p, p),) * 3
    x = jax.random.normal(kx, (1,) + sp + (ci,), jnp.float32)
    w = jax.random.normal(kw, (k,) * 3 + (ci, co), jnp.float32) * 0.1
    cot = jax.random.normal(kc, (1,) + sp + (co,), jnp.float32)
    g0 = jax.grad(lambda ww: jnp.sum(_baseline(x, ww, 1, pads) * cot))(w)
    dw = pallas_wgrad_s1(x, cot, k, interpret=True)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(g0),
                               rtol=2e-5, atol=2e-4)


def test_conv_same_pallas_gate_end_to_end(monkeypatch):
    monkeypatch.setenv("DPI_PALLAS_WGRAD", "1")
    kx, kw, kc = jax.random.split(jax.random.PRNGKey(13), 3)
    sp, k, ci, co = (6, 8, 16), 3, 5, 4
    pads = ((1, 1),) * 3
    x = jax.random.normal(kx, (1,) + sp + (ci,), jnp.float32)
    w = jax.random.normal(kw, (k,) * 3 + (ci, co), jnp.float32) * 0.1
    cot = jax.random.normal(kc, (1,) + sp + (co,), jnp.float32)
    assert conv_vjp._use_pallas(x, w, 1, pads)

    def loss(f):
        return lambda xx, ww: jnp.sum(f(xx, ww, 1, pads) * cot)

    g0 = jax.grad(loss(_baseline), (0, 1))(x, w)
    g1 = jax.grad(loss(conv_same), (0, 1))(x, w)
    for a, b, nm in zip(g1, g0, ("dx", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-4, err_msg=nm)


def test_gate_rejects_unsupported_shapes():
    # batch > 1
    assert not wgrad_supported((2, 6, 8, 16, 5), (3, 3, 3, 5, 3), 1,
                               ((1, 1),) * 3)
    # stride 2
    assert not wgrad_supported((1, 6, 8, 16, 5), (3, 3, 3, 5, 3), 2,
                               ((1, 1),) * 3)
    # even kernel
    assert not wgrad_supported((1, 6, 8, 16, 5), (4, 4, 4, 5, 3), 1,
                               ((1, 1),) * 3)
    # 1x1 (pure matmul, XLA already optimal)
    assert not wgrad_supported((1, 6, 8, 16, 5), (1, 1, 1, 5, 3), 1,
                               ((0, 0),) * 3)
    # asymmetric pads
    assert not wgrad_supported((1, 6, 8, 16, 5), (3, 3, 3, 5, 3), 1,
                               ((0, 2), (1, 1), (1, 1)))
    # 2D
    assert not wgrad_supported((1, 8, 16, 5), (3, 3, 5, 3), 1,
                               ((1, 1),) * 2)
    # H not a sublane multiple
    assert not wgrad_supported((1, 6, 9, 16, 5), (3, 3, 3, 5, 3), 1,
                               ((1, 1),) * 3)
    # flagship res-0 shapes FIT (bf16): [1,128,64,64,536] k=3, co=32 and
    # the co=128 ResPath one; Ci is grid-chunked so the 1096-channel res-1
    # conv that blew v2's VMEM stack is admissible too
    assert wgrad_supported((1, 128, 64, 64, 536), (3, 3, 3, 536, 32), 1,
                           ((1, 1),) * 3, itemsize=2)
    assert wgrad_supported((1, 128, 64, 64, 536), (3, 3, 3, 536, 128),
                           1, ((1, 1),) * 3, itemsize=2)
    assert wgrad_supported((1, 64, 32, 32, 1096), (3, 3, 3, 1096, 64), 1,
                           ((1, 1),) * 3, itemsize=2)
    # a co=1024 monster's dy slabs exceed the per-step VMEM budget
    assert not wgrad_supported((1, 128, 64, 64, 536), (3, 3, 3, 536, 1024),
                               1, ((1, 1),) * 3, itemsize=2)


def test_bf16_inputs_f32_accumulation():
    kx, kw, kc = jax.random.split(jax.random.PRNGKey(17), 3)
    sp, k, ci, co = (4, 8, 8), 3, 6, 4
    x = jax.random.normal(kx, (1,) + sp + (ci,), jnp.float32)
    cot = jax.random.normal(kc, (1,) + sp + (co,), jnp.float32)
    w = jnp.zeros((k,) * 3 + (ci, co), jnp.float32)
    pads = ((1, 1),) * 3
    g32 = jax.grad(lambda ww: jnp.sum(_baseline(x, ww, 1, pads) * cot))(w)
    dw16 = pallas_wgrad_s1(x.astype(jnp.bfloat16), cot.astype(jnp.bfloat16),
                           k, interpret=True)
    assert dw16.dtype == jnp.float32  # accumulates in f32
    np.testing.assert_allclose(np.asarray(dw16), np.asarray(g32),
                               rtol=0.05, atol=0.1)
