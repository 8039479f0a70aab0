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

Lessons from the three flagship-scale failures this design went through:

* v1 pre-padded x and dy in HBM — those ~600 MB transient copies of the
  res-0 activations pushed the backward over HBM (bench ladder OOM'd
  through remat 3). Both operands are now read UNPADDED; the H/W same-pad
  lives in a VMEM scratch slab, depth edges are masked taps.
* v1/v2 unrolled all k^3 (or k^2) taps in one grid step over the FULL
  channel dim — Mosaic stack-allocates the unrolled slice temporaries, and
  k^2 live (H*W, Ci) copies blew the 16 MB scoped-VMEM stack on the
  1096-channel res-1 conv ("Ran out of memory in memory space vmem ... on
  stack"). C_in is now CHUNKED by a leading grid dimension (128 lanes per
  step), bounding every temporary at ~1 MB independent of the conv width.
* v3 made the k^2 H/W taps a grid dimension and sliced the pad scratch at
  a *dynamic* (program_id-derived) offset — Mosaic requires dynamic
  offsets on the second-minor (sublane) dim to be provably 8-aligned and
  rejected the W-tap ("cannot statically prove that index in dimension 1
  is a multiple of 8"). The H tap is a grid dim indexing the UNTILED
  leading scratch dim (no alignment constraint); the k W-taps are
  statically unrolled in-kernel (static unaligned sublane slices lower
  fine — v1 compiled them).

Grid (Ci-chunks, k H-taps, D), depth innermost so the f32 output row
accumulates across consecutive steps. Per step: the x depth-slab chunk is
written into the interior of a zeroed (H+2p, W+2p, 128) scratch, one
dynamically-H-offset window per grid step and k static W-offset windows
are sliced from it, and k masked MXU dots (M=128-chunk, N=Co, K=H*W)
against the depth-reachable dy slabs accumulate into the (k*k, 128, Co)
output row for this (H-tap, chunk).

The reference counterpart is cuDNN's backward-filter algorithm choice
(torch autograd under /root/reference/main.py:162's loss.backward()); this
is the TPU-native equivalent. Exactness is pinned against ``jax.grad`` of
the raw conv in tests/test_pallas_wgrad.py.

Wired into :func:`ops.conv_vjp.conv_same`'s custom VJP behind
``DPI_PALLAS_WGRAD`` (shape-gated: batch 1, stride 1, odd cubic kernel,
same-pad, sublane-friendly H/W, per-step VMEM fit). Off-TPU backends run
in interpret mode (tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_wgrad_s1", "wgrad_supported"]

_CHUNK = 128  # Ci lanes per grid step


def _make_kernel(k: int, d_size: int, h: int, w: int):
    """Kernel body; grid = (ci_chunks, k H-taps, depth)."""
    p = (k - 1) // 2

    def kernel(*refs):
        x_ref = refs[0]
        dy_refs = refs[1:1 + k]
        out_ref = refs[1 + k]        # (1, k*k, _CHUNK, Co) f32
        xpad_ref = refs[2 + k]       # VMEM scratch (h + 2p, w + 2p, _CHUNK)
        c = pl.program_id(0)
        t1 = pl.program_id(1)
        v = pl.program_id(2)

        # borders of the same-pad scratch stay zero for the whole sweep;
        # only the interior is (re)written below, once per step
        @pl.when(jnp.logical_and(jnp.logical_and(c == 0, t1 == 0), v == 0))
        def _():
            xpad_ref[:] = jnp.zeros_like(xpad_ref)

        @pl.when(v == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xpad_ref[p:p + h, p:p + w, :] = x_ref[0]

        for t2 in range(k):
            # H offset is dynamic (grid) but indexes the untiled leading
            # dim; the W offset must be static for Mosaic (sublane dim)
            xv = xpad_ref[pl.ds(t1, h), t2:t2 + w, :].reshape(h * w, _CHUNK)
            for t0 in range(k):
                # x slab v pairs with dy slab v - t0 + p for depth tap t0;
                # dy_refs[t0]'s index map clamps that into range, so mask
                # the contribution when the true index is off the volume
                dv = v - t0 + p
                valid = jnp.logical_and(dv >= 0, dv <= d_size - 1)

                @pl.when(valid)
                def _(t0=t0, t2=t2, xv=xv):
                    dyv = dy_refs[t0][0].reshape(h * w, dy_refs[t0].shape[-1])
                    acc = jax.lax.dot_general(
                        xv, dyv, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[0, t2 * k + t0] += acc

    return kernel


def _vmem_bytes(x_shape, co: int, k: int, itemsize: int) -> int:
    """Rough per-step VMEM footprint (double-buffered blocks + the k live
    W-tap slice temporaries; Ci is chunked so only _CHUNK lanes count)."""
    _, _, h, w, _ = x_shape
    p = (k - 1) // 2
    x_slab = h * w * _CHUNK * itemsize * 2             # double-buffered in
    xpad = (h + 2 * p) * (w + 2 * p) * _CHUNK * itemsize
    dy_slabs = k * h * w * co * itemsize * 2
    out_row = k * k * _CHUNK * co * 4 * 2
    temps = k * h * w * _CHUNK * itemsize + k * k * _CHUNK * co * 4
    return x_slab + xpad + dy_slabs + out_row + temps


def wgrad_supported(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
                    stride: int, pads, itemsize: int = 2) -> bool:
    """Gate: 3D, batch 1, stride 1, odd cubic kernel with same-pad padding,
    spatial extents sublane-friendly, and the per-step working set fits
    VMEM. Ci is grid-chunked, so any channel count is admissible; wide
    C_out still scales the dy slabs and is bounded here."""
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
    # v5e VMEM is 128 MB/core with a 16 MB scoped stack; cap the per-step
    # footprint well under that. Admits every flagship conv incl. the
    # 1096-channel res-1 ones v2 could not hold.
    return _vmem_bytes(x_shape, w_shape[-1], k, itemsize) <= 32 << 20


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_wgrad_unpadded(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                           interpret: bool) -> jnp.ndarray:
    """x: (D, H, W, Ci) input (batch squeezed, UNPADDED); dy: (D, H, W, Co)
    gradient (unpadded). Returns dW (k, k*k, Ci_pad, Co) float32 laid out
    as [t1, t2*k + t0] — the caller slices Ci and re-orders to DHWIO."""
    d_size, h, w, ci = x.shape
    co = dy.shape[-1]
    p = (k - 1) // 2
    n_c = pl.cdiv(ci, _CHUNK)

    in_specs = [pl.BlockSpec((1, h, w, _CHUNK),
                             lambda c, t1, v: (v, 0, 0, c),
                             memory_space=pltpu.VMEM)]
    for t0 in range(k):
        # clamped depth pairing; the kernel masks the off-volume taps
        in_specs.append(pl.BlockSpec(
            (1, h, w, co),
            lambda c, t1, v, tt=t0: (jnp.clip(v - tt + p, 0, d_size - 1),
                                     0, 0, 0),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, k * k, _CHUNK, co),
                            lambda c, t1, v: (t1, 0, c, 0),
                            memory_space=pltpu.VMEM)

    isz = x.dtype.itemsize
    flops = 2 * k ** 3 * n_c * _CHUNK * co * h * w * d_size
    bytes_accessed = (n_c * k * d_size * h * w * _CHUNK * isz   # x per tap
                      + n_c * k * k * d_size * h * w * co * isz  # dy slabs
                      + k ** 3 * n_c * _CHUNK * co * 4)
    return pl.pallas_call(
        _make_kernel(k, d_size, h, w),
        grid=(n_c, k, d_size),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k, k * k, n_c * _CHUNK, co),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2 * p, w + 2 * p, _CHUNK), x.dtype)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        # Mosaic's default scoped-VMEM budget is 16 MB and the flagship
        # res-0 step lands at 16.06 MB (measured: the first on-chip v4 run
        # failed by exactly 60 KB at every remat level). v5e VMEM is
        # 128 MB/core; grant half, consistent with the 32 MB gate formula.
        # dimension_semantics: the kernel REQUIRES sequential grid order —
        # the scratch border is zeroed only at step (0,0,0) and out_ref
        # accumulates across consecutive depth steps — so pin every dim
        # "arbitrary"; on megacore TPUs (v4/v4p) Mosaic would otherwise be
        # free to split the leading grid dim across cores and corrupt dW.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *([dy] * k))


def pallas_wgrad_s1(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of a same-pad stride-1 k^3 conv (NDHWC/DHWIO).

    x: (1, D, H, W, Ci), dy: (1, D, H, W, Co) -> dW (k, k, k, Ci, Co) f32.
    No HBM padding: the H/W pad happens in VMEM scratch, depth edges are
    masked taps, and Ci rides a ceil-divided grid dim whose OOB lanes
    only ever pollute the padded dW rows sliced off here (the garbage
    lanes of the last x chunk enter the dot as the M dim, so they reach
    only the [Ci:Ci_pad) output rows; see module docstring).
    """
    assert x.shape[0] == 1 and dy.shape[0] == 1
    ci, co = x.shape[-1], dy.shape[-1]
    dw = _pallas_wgrad_unpadded(x[0], dy[0], k, interpret)
    # rows are [t1, t2*k + t0]: slice the Ci pad, reorder to (t0, t1, t2)
    dw = dw[:, :, :ci, :].reshape(k, k, k, ci, co)   # (t1, t2, t0, Ci, Co)
    return dw.transpose(2, 0, 1, 3, 4)
