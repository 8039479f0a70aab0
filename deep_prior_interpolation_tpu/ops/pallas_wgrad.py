"""Pallas TPU kernel: weight gradient of a same-pad stride-1 3D conv.

Why this exists (r3/r4 flagship profile, docs/PERF.md): XLA:TPU lowers the
backward-filter of a conv as a convolution whose matmul N dimension is
C_out. The flagship phase-space MulResUnet3D step is dominated by exactly
these ops — the decoder res-0 wgrad bf16[3,3,3,536,32] alone runs at ~7%
MXU (35.5 ms/step of a ~500 ms step) — plus the T(2,128)-packed relayout
copies the conv emitter demands around every operand. The packed
dot_general reformulation (ops/conv_vjp.py) fixed the contraction shape but
lost to XLA's layout choices for its DYP canvases (docs/PERF.md, rejected
variants). This kernel performs the same contraction *inside Pallas*, where
the canvases never exist and no emitter layout contract applies:

    dW[t, ci, co] = sum_v xp[v, ci] * dy[v - t, co]

Grid over the padded depth axis (one xp slab per step); the k^3 taps are a
static unroll of sublane-shifted slices of the resident xp slab dotted with
the k depth-reachable dy slabs — M = C_in, N = C_out, K = H*W (streamed).
The accumulator IS the output block (f32, revisited across the whole grid:
the block index map is constant, so Pallas keeps it VMEM-resident and
flushes once at the end).

The reference counterpart is cuDNN's backward-filter algorithm choice
(torch autograd under /root/reference/main.py:162's loss.backward()); this
is the TPU-native equivalent. Exactness is pinned against ``jax.grad`` of
the raw conv in tests/test_pallas_wgrad.py.

Wired into :func:`ops.conv_vjp.conv_same`'s custom VJP behind
``DPI_PALLAS_WGRAD`` (shape-gated: batch 1, stride 1, odd cubic kernel,
same-pad, VMEM fit). Off-TPU backends run in interpret mode (tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_wgrad_s1", "wgrad_supported"]


def _make_kernel(k: int, h: int, w: int):
    """Kernel body for a k^3 stride-1 wgrad; h, w = dy spatial extents."""

    def kernel(*refs):
        xp_ref = refs[0]
        dy_refs = refs[1:1 + k]
        out_ref = refs[1 + k]
        v = pl.program_id(0)

        @pl.when(v == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xp_ref[0]  # (h + k - 1, w + k - 1, Ci)
        for j in range(k):
            t0 = (k - 1) - j  # dy_p slab v + j pairs with depth tap k-1-j
            dyv = dy_refs[j][0].reshape(h * w, dy_refs[j].shape[-1])
            for t1 in range(k):
                for t2 in range(k):
                    xv = xs[t1:t1 + h, t2:t2 + w, :].reshape(
                        h * w, xs.shape[-1])
                    acc = jax.lax.dot_general(
                        xv, dyv, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    t_idx = (t0 * k + t1) * k + t2
                    out_ref[t_idx] += acc

    return kernel


def _vmem_bytes(x_shape, co: int, k: int, itemsize: int) -> int:
    """Rough VMEM footprint of one grid step (double-buffered inputs)."""
    _, _, h, w, ci = x_shape
    xp_slab = (h + k - 1) * (w + k - 1) * ci * itemsize * 2  # double buffer
    dy_slabs = k * h * w * co * itemsize * 2
    out = k ** 3 * ci * co * 4
    return xp_slab + dy_slabs + out


def wgrad_supported(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
                    stride: int, pads, itemsize: int = 2) -> bool:
    """Gate: 3D, batch 1, stride 1, odd cubic kernel with same-pad padding,
    spatial extents sublane-friendly, and the whole working set fits VMEM
    (no channel chunking in v1 — the flagship res-0 shapes fit whole)."""
    if len(w_shape) != 5 or stride != 1 or x_shape[0] != 1:
        return False
    k = w_shape[0]
    if k % 2 == 0 or k == 1 or w_shape[1] != k or w_shape[2] != k:
        return False
    p = (k - 1) // 2
    if tuple(map(tuple, pads)) != ((p, p),) * 3:
        return False
    if x_shape[2] % 8 or x_shape[3] % 8:  # clean sublane merge of (H, W)
        return False
    return _vmem_bytes(x_shape, w_shape[-1], k, itemsize) <= 14 << 20


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_wgrad_padded(xp: jnp.ndarray, dy_p: jnp.ndarray, k: int,
                         interpret: bool) -> jnp.ndarray:
    """xp: (D+k-1, H+k-1, W+k-1, Ci) pre-padded input (batch squeezed);
    dy_p: (D + 2*(k-1), H, W, Co) gradient pre-padded with k-1 zero slabs
    front and back in depth. Returns dW (k^3, Ci, Co) float32."""
    dp, hp, wp, ci = xp.shape
    h, w, co = dy_p.shape[1], dy_p.shape[2], dy_p.shape[3]

    in_specs = [pl.BlockSpec((1, hp, wp, ci), lambda v: (v, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for j in range(k):
        in_specs.append(
            pl.BlockSpec((1, h, w, co), lambda v, jj=j: (v + jj, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((k ** 3, ci, co), lambda v: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * k ** 3 * ci * co * h * w * dp
    bytes_accessed = (xp.size * xp.dtype.itemsize
                      + k * dy_p.size * dy_p.dtype.itemsize
                      + k ** 3 * ci * co * 4)
    return pl.pallas_call(
        _make_kernel(k, h, w),
        grid=(dp,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k ** 3, ci, co), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(xp, *([dy_p] * k))


def pallas_wgrad_s1(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of a same-pad stride-1 k^3 conv (NDHWC/DHWIO).

    x: (1, D, H, W, Ci), dy: (1, D, H, W, Co) -> dW (k, k, k, Ci, Co) f32.
    """
    assert x.shape[0] == 1 and dy.shape[0] == 1
    p = (k - 1) // 2
    xp = jnp.pad(x[0], ((p, p), (p, p), (p, p), (0, 0)))
    dy_p = jnp.pad(dy[0], ((k - 1, k - 1), (0, 0), (0, 0), (0, 0)))
    dw = _pallas_wgrad_padded(xp, dy_p, k, interpret)
    return dw.reshape(k, k, k, x.shape[-1], dy.shape[-1])
