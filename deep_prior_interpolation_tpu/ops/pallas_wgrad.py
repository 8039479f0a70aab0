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

The kernel reads x and dy UNPADDED straight from HBM (v1 pre-padded both in
HBM, and those ~600 MB transient copies of the res-0 activations pushed the
flagship backward over HBM — bench fallback ladder OOM'd through remat 2).
Grid over the depth axis: each step loads one x slab into a zeroed
(H+2p, W+2p, Ci) VMEM scratch (the H/W same-pad), pairs it with the k
depth-reachable dy slabs via clamped block index maps, and masks the
accumulation of out-of-range depth taps with ``pl.when``. The k^3 taps are
a static unroll of sublane-shifted slices of the scratch slab dotted with
the dy slabs — M = C_in, N = C_out, K = H*W (streamed). The accumulator IS
the output block (f32, revisited across the whole grid: the block index map
is constant, so Pallas keeps it VMEM-resident and flushes once at the end).

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
    """Kernel body for a k^3 stride-1 wgrad; d_size, h, w = input extents."""
    p = (k - 1) // 2

    def kernel(*refs):
        x_ref = refs[0]
        dy_refs = refs[1:1 + k]
        out_ref = refs[1 + k]
        xpad_ref = refs[2 + k]  # VMEM scratch (h + 2p, w + 2p, Ci)
        v = pl.program_id(0)

        @pl.when(v == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # the H/W same-pad lives in VMEM: zero the border once per step,
        # write the slab into the centre (cost ~= one slab write, ~1e-3 of
        # the step's MXU work)
        xpad_ref[:] = jnp.zeros_like(xpad_ref)
        xpad_ref[p:p + h, p:p + w, :] = x_ref[0]
        xs = xpad_ref[:]

        for t0 in range(k):
            # x slab v pairs with dy slab v - t0 + p for depth tap t0;
            # dy_refs[t0]'s index map clamps that into range, so mask the
            # contribution when the true index is off the volume
            dv = v - t0 + p
            valid = jnp.logical_and(dv >= 0, dv <= d_size - 1)

            @pl.when(valid)
            def _(t0=t0):
                dyv = dy_refs[t0][0].reshape(h * w,
                                             dy_refs[t0].shape[-1])
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
    """Rough VMEM footprint of one grid step."""
    _, _, h, w, ci = x_shape
    p = (k - 1) // 2
    x_slab = h * w * ci * itemsize * 2              # double-buffered input
    xpad = (h + 2 * p) * (w + 2 * p) * ci * itemsize  # scratch (persistent)
    dy_slabs = k * h * w * co * itemsize * 2
    out = k ** 3 * ci * co * 4
    return x_slab + xpad + dy_slabs + out


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
    # v5e VMEM is 128 MB/core; cap at half for double-buffering slack and
    # Mosaic temporaries. Admits every flagship res-0/1/2 wgrad incl. the
    # Co=128 ResPath one the r3 profile flagged.
    return _vmem_bytes(x_shape, w_shape[-1], k, itemsize) <= 64 << 20


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_wgrad_unpadded(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                           interpret: bool) -> jnp.ndarray:
    """x: (D, H, W, Ci) input (batch squeezed, UNPADDED); dy: (D, H, W, Co)
    gradient (unpadded). Returns dW (k^3, Ci, Co) float32."""
    d_size, h, w, ci = x.shape
    co = dy.shape[-1]
    p = (k - 1) // 2

    in_specs = [pl.BlockSpec((1, h, w, ci), lambda v: (v, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for t0 in range(k):
        # clamped depth pairing; the kernel masks the off-volume taps
        in_specs.append(pl.BlockSpec(
            (1, h, w, co),
            lambda v, tt=t0: (jnp.clip(v - tt + p, 0, d_size - 1), 0, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((k ** 3, ci, co), lambda v: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * k ** 3 * ci * co * h * w * d_size
    bytes_accessed = (x.size * x.dtype.itemsize
                      + k * dy.size * dy.dtype.itemsize
                      + k ** 3 * ci * co * 4)
    return pl.pallas_call(
        _make_kernel(k, d_size, h, w),
        grid=(d_size,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k ** 3, ci, co), jnp.float32),
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
    dw = _pallas_wgrad_unpadded(x[0], dy[0], k, interpret)
    return dw.reshape(k, k, k, x.shape[-1], dy.shape[-1])
