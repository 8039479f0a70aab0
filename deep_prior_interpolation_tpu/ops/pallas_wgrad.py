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

    dW[t, ci, co] = sum_d x[d] (*) dy[d - t + p]      (depth-slab pairing)

Lessons from the two flagship-scale failures this design went through:

* v1 pre-padded x and dy in HBM — those ~600 MB transient copies of the
  res-0 activations pushed the backward over HBM (bench ladder OOM'd
  through remat 3). Both operands are now read UNPADDED; the H/W same-pad
  lives in a VMEM scratch slab, depth edges are masked taps.
* v1 also unrolled all k^3 taps in one grid step — Mosaic stack-allocates
  the unrolled slice temporaries, and 27 live (H*W, Ci) copies blew VMEM
  on the 1096-channel res-1 conv ("Ran out of memory in memory space
  vmem ... on stack"). The k^2 H/W taps are now a second GRID dimension:
  one slice temporary lives per step, and the output block per step is a
  single (k, Ci, Co) tap row.

Grid (D, k^2), inner axis = H/W tap. Per step: the x depth-slab is written
into a zeroed (H+2p, W+2p, Ci) scratch once per slab (``pl.when`` on the
inner index), one dynamically-offset (H, W, Ci) window is sliced from it,
and k masked MXU dots (M=Ci, N=Co, K=H*W) against the depth-reachable dy
slabs accumulate into the f32 output row, which Pallas re-visits across the
depth sweep and flushes on tap change.

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


def _make_kernel(k: int, d_size: int, h: int, w: int):
    """Kernel body; grid = (depth, k*k H/W taps)."""
    p = (k - 1) // 2

    def kernel(*refs):
        x_ref = refs[0]
        dy_refs = refs[1:1 + k]
        out_ref = refs[1 + k]        # (1, k, Ci, Co) f32 — one (t1,t2) row
        xpad_ref = refs[2 + k]       # VMEM scratch (h + 2p, w + 2p, Ci)
        v = pl.program_id(0)
        t12 = pl.program_id(1)
        t1 = t12 // k
        t2 = t12 % k

        @pl.when(v == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # fill the same-pad scratch once per depth slab (inner index 0),
        # not once per tap
        @pl.when(t12 == 0)
        def _():
            xpad_ref[:] = jnp.zeros_like(xpad_ref)
            xpad_ref[p:p + h, p:p + w, :] = x_ref[0]

        xv = xpad_ref[pl.ds(t1, h), pl.ds(t2, w), :].reshape(
            h * w, xpad_ref.shape[-1])
        for t0 in range(k):
            # x slab v pairs with dy slab v - t0 + p for depth tap t0;
            # dy_refs[t0]'s index map clamps that into range, so mask the
            # contribution when the true index is off the volume
            dv = v - t0 + p
            valid = jnp.logical_and(dv >= 0, dv <= d_size - 1)

            @pl.when(valid)
            def _(t0=t0):
                dyv = dy_refs[t0][0].reshape(h * w, dy_refs[t0].shape[-1])
                acc = jax.lax.dot_general(
                    xv, dyv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, t0] += acc

    return kernel


def _vmem_bytes(x_shape, co: int, k: int, itemsize: int) -> int:
    """Rough VMEM footprint of one grid step (incl. the slice temporary
    and the double-buffered blocks)."""
    _, _, h, w, ci = x_shape
    p = (k - 1) // 2
    x_slab = h * w * ci * itemsize * 2                 # double-buffered in
    xpad = (h + 2 * p) * (w + 2 * p) * ci * itemsize   # scratch (persistent)
    dy_slabs = k * h * w * co * itemsize * 2
    out_row = k * ci * co * 4 * 2
    temps = h * w * ci * itemsize + k * ci * co * 4    # xv slice + k accs
    return x_slab + xpad + dy_slabs + out_row + temps


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
    # v5e VMEM is 128 MB/core; cap at half for Mosaic temporaries we can't
    # see from here. Admits every flagship res-0/1/2 wgrad incl. the Co=128
    # ResPath one the r3 profile flagged.
    return _vmem_bytes(x_shape, w_shape[-1], k, itemsize) <= 64 << 20


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_wgrad_unpadded(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                           interpret: bool) -> jnp.ndarray:
    """x: (D, H, W, Ci) input (batch squeezed, UNPADDED); dy: (D, H, W, Co)
    gradient (unpadded). Returns dW (k*k, k, Ci, Co) float32 laid out as
    [t1*k + t2, t0] — the caller re-orders to DHWIO."""
    d_size, h, w, ci = x.shape
    co = dy.shape[-1]
    p = (k - 1) // 2

    in_specs = [pl.BlockSpec((1, h, w, ci), lambda v, t: (v, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for t0 in range(k):
        # clamped depth pairing; the kernel masks the off-volume taps
        in_specs.append(pl.BlockSpec(
            (1, h, w, co),
            lambda v, t, tt=t0: (jnp.clip(v - tt + p, 0, d_size - 1),
                                 0, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, k, ci, co), lambda v, t: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * k ** 3 * ci * co * h * w * d_size
    bytes_accessed = (x.size * x.dtype.itemsize
                      + k * dy.size * dy.dtype.itemsize
                      + k ** 3 * ci * co * 4)
    return pl.pallas_call(
        _make_kernel(k, d_size, h, w),
        grid=(d_size, k * k),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k * k, k, ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2 * p, w + 2 * p, ci), x.dtype)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, *([dy] * k))


def pallas_wgrad_s1(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of a same-pad stride-1 k^3 conv (NDHWC/DHWIO).

    x: (1, D, H, W, Ci), dy: (1, D, H, W, Co) -> dW (k, k, k, Ci, Co) f32.
    No HBM padding: the H/W pad happens in VMEM scratch, depth edges are
    masked taps (see module docstring).
    """
    assert x.shape[0] == 1 and dy.shape[0] == 1
    ci, co = x.shape[-1], dy.shape[-1]
    dw = _pallas_wgrad_unpadded(x[0], dy[0], k, interpret)
    # rows are [t1*k + t2, t0]: reorder to (t0, t1, t2)
    dw = dw.reshape(k, k, k, ci, co)        # (t1, t2, t0, Ci, Co)
    return dw.transpose(2, 0, 1, 3, 4)
