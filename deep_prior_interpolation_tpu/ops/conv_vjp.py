"""Same-pad convolution with an MXU-shaped weight-gradient.

XLA:TPU lowers the backward-filter of a conv as a convolution whose matmul
N-dimension is C_out. The flagship phase-space MulResUnet3D backward is
dominated by exactly these ops (r3 profile of the 505 s/1000-iter config:
the four largest backward-filter fusions are 36/19/12/9 ms of a 506 ms
step) because its C_out lane counts (8..64) fill <= 25% of the MXU's 128
lanes, and because the conv emitter demands input layouts
(``T(2,128)``-packed) that surround every conv with relayout copies.

``conv_same`` keeps the forward conv and the data-gradient on XLA's native
conv path (both efficient: forward C_in fills the lanes; dgrad contracts
over C_out but XLA flips it to a conv over C_in) and replaces ONLY the
weight gradient with a tap-packed matmul:

    dW[t, ci, co] = sum_{n,u} xp[n, u, ci] * DYP[n, u, (t, co)]
    DYP[n, u, (t, co)] = dy[n, (u - t) / stride, co]   (0 outside / off-grid)

i.e. the gradient is placed into a padded canvas once per kernel tap and
the whole weight gradient becomes ONE ``dot_general`` with M = C_in,
K = n*prod(U) (the spatial axis — streamed), N = taps * C_out: 27 * 32 =
864 lanes where the conv emitter had 32. Taps are processed in groups so
the DYP canvas stays under ``DPI_WGRAD_CAP_MB`` (default 512 MB).

Strided convs (the full-res phase ENTRY conv: stride 2, kernel (k+1)^d)
first fold x by the stride (space-to-depth): taps drop s^d-fold to
ceil(k/s)^d while C_in lanes multiply by s^d, then the same stride-1
packed wgrad runs on the folded tensor and the (a, phi) tap factors are
interleaved back into kernel positions t = a*s + phi.

Parity: the math is the exact weight gradient (tests pin it against
``jax.grad`` of the plain conv to f32 accuracy); accumulation runs on the
MXU in f32 (``preferred_element_type``) and is rounded to the param compute
dtype at the end, same as the conv-emitter path it replaces.

Reference parity note: the reference relies on cuDNN's backward-filter
algorithms (torch autograd, e.g. /root/reference/architectures/base.py
conv modules); this module is the TPU-native equivalent of picking the
right backward-filter algorithm.
"""
from __future__ import annotations

import contextlib
import itertools
import os
import threading
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv_same", "conv_impl", "current_conv_impl"]

# trace-time conv formulation, switched by :func:`conv_impl`. Thread-local
# so concurrent traces (e.g. a background compile thread) cannot observe
# another thread's mode.
_IMPL_TLS = threading.local()


def current_conv_impl() -> str:
    return getattr(_IMPL_TLS, "mode", "conv")


@contextlib.contextmanager
def conv_impl(mode: str):
    """Select the conv formulation for traces opened inside the context.

    "conv" (default): ``lax.conv_general_dilated`` — XLA's conv emitters.
    "tapmm": sum of per-tap matmuls. Under ``vmap`` with per-patch weights
    a conv lowers to a grouped convolution, which XLA:TPU runs far below
    single-patch efficiency; the tap form instead vmaps every tap into one
    BATCHED matmul (B, M, Ci) @ (B, Ci, Co) at full MXU rate — measured
    6.6x faster per patch than the grouped lowering on the 2D lines-scale
    patch (docs/PERF.md, r4 vmap-conv study).

    Trace-time only, and jit-cache-safe by construction: the solver's
    ``run_chunk`` re-enters this context around its own ``lax.scan`` with
    the mode from ``StepSettings.conv_mode`` (part of the solver's jit
    cache key), so whichever function is being traced carries its own
    mode. A cached executable is unaffected by the ambient mode. Direct
    users outside the solver should wrap the call that TRACES their jit.
    """
    prev = current_conv_impl()
    _IMPL_TLS.mode = mode
    try:
        yield
    finally:
        _IMPL_TLS.mode = prev


def _tap_conv(x, w, stride, pads, prec):
    """The conv as a sum of k^d per-tap matmuls (same semantics as
    :func:`_fwd_conv`: one stride for all spatial dims, explicit pads).
    Contributions accumulate in f32 and round once at the end, matching
    the conv path's single f32 accumulation."""
    d = w.ndim - 2
    ks = w.shape[:d]
    xp = jnp.pad(x, [(0, 0)] + list(pads) + [(0, 0)])
    out_sp = tuple((xp.shape[1 + i] - ks[i]) // stride + 1 for i in range(d))
    acc = None
    for t in itertools.product(*[range(k) for k in ks]):
        lim = tuple(t[i] + (out_sp[i] - 1) * stride + 1 for i in range(d))
        xs = lax.slice(xp, (0,) + t + (0,),
                       (xp.shape[0],) + lim + (xp.shape[-1],),
                       (1,) + (stride,) * d + (1,))
        c = lax.dot_general(xs, w[t], (((xs.ndim - 1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    return acc.astype(x.dtype)


def _dn(d: int) -> Tuple[str, str, str]:
    sp = "DHW"[-d:] if d <= 3 else "".join(chr(ord("A") + i) for i in range(d))
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def _fwd_conv(x, w, stride, pads):
    d = w.ndim - 2
    # float32 means float32: TPU XLA's default matmul precision executes
    # f32 convs with bf16 passes, which measurably stalls DIP convergence
    # on hard problems vs the true-f32 torch reference (golden_3d_600
    # hard-seed study). bf16 nets are unaffected (that trade is explicit).
    # DPI_F32_CONV_PRECISION=default restores the old behaviour for A/B
    # measurements (scripts/golden_3d_dist.py precision study).
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
            and os.environ.get("DPI_F32_CONV_PRECISION", "highest")
            != "default" else None)
    if current_conv_impl() == "tapmm":
        return _tap_conv(x, w, stride, pads, prec)
    return lax.conv_general_dilated(
        x, w, (stride,) * d, list(pads),
        dimension_numbers=_dn(d), preferred_element_type=x.dtype,
        precision=prec)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_same(x: jnp.ndarray, w: jnp.ndarray, stride: int,
              pads: Tuple[Tuple[int, int], ...]) -> jnp.ndarray:
    """``lax.conv_general_dilated`` (NHWC/HWIO, one stride for all spatial
    dims, explicit per-dim ``pads``) with the packed weight-gradient."""
    return _fwd_conv(x, w, stride, pads)


def _conv_same_fwd(x, w, stride, pads):
    return _fwd_conv(x, w, stride, pads), (x, w)


def _tap_groups(n_taps, nu, co, itemsize):
    cap = int(os.environ.get("DPI_WGRAD_CAP_MB", "512")) << 20
    per_tap = nu * co * itemsize
    g = max(1, min(n_taps, cap // max(per_tap, 1)))
    return g, -(-n_taps // g)


def _packed_wgrad(x, dy, wshape, stride, pads):
    """dW for a stride-1 conv as ceil(taps/g) dot_generals (stride must be 1
    here — strided convs go through :func:`_folded_wgrad`)."""
    assert stride == 1
    d = len(wshape) - 2
    ks = wshape[:d]
    ci, co = wshape[-2], wshape[-1]
    xp = jnp.pad(x, [(0, 0)] + list(pads) + [(0, 0)])
    U = xp.shape[1:-1]
    S = dy.shape[1:-1]
    n = x.shape[0]
    nu = n * int(np.prod(U))
    xf = xp.reshape(nu, ci)
    taps = list(itertools.product(*[range(k) for k in ks]))
    g, _ = _tap_groups(len(taps), nu, co, dy.dtype.itemsize)
    outs = []
    for i in range(0, len(taps), g):
        grp = taps[i:i + g]
        parts = []
        for t in grp:
            spec = [(0, 0, 0)]
            for ax in range(d):
                spec.append((t[ax], U[ax] - S[ax] - t[ax], 0))
            spec.append((0, 0, 0))
            # flat (nu, co) blocks concatenated on the LANE axis: the 5-D
            # stack+reshape form materialised at a mismatched layout and was
            # re-copied wholesale (r3 profile: ~50 ms/step of canvas copies)
            parts.append(lax.pad(dy, jnp.zeros((), dy.dtype),
                                 spec).reshape(nu, co))
        dyp = jnp.concatenate(parts, axis=-1)
        o = lax.dot_general(xf, dyp, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        outs.append(o.reshape(ci, len(grp), co))
    dw = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return jnp.swapaxes(dw, 0, 1).reshape(tuple(ks) + (ci, co))


def _folded_wgrad(x, dy, wshape, stride, pads):
    """dW for a stride-s conv: fold x by s (space-to-depth — taps drop to
    ceil(k/s)^d, lanes multiply by s^d), run the stride-1 packed wgrad on
    the folded tensor, then interleave (a, phi) tap factors back into the
    kernel positions t = a*s + phi."""
    d = len(wshape) - 2
    k = wshape[0]
    ci, co = wshape[-2], wshape[-1]
    s = stride
    A = -(-k // s)
    S = dy.shape[1:-1]
    xp = jnp.pad(x, [(0, 0)] + list(pads) + [(0, 0)])
    U = xp.shape[1:-1]
    n = x.shape[0]
    M = tuple(max(S[i] + A - 1, -(-U[i] // s)) for i in range(d))
    xp = jnp.pad(xp, [(0, 0)] + [(0, s * M[i] - U[i]) for i in range(d)]
                 + [(0, 0)])
    shp = (n,) + sum(((M[i], s) for i in range(d)), ()) + (ci,)
    xs = xp.reshape(shp)
    perm = ([0] + [1 + 2 * i for i in range(d)] + [1 + 2 * d]
            + [2 + 2 * i for i in range(d)])
    xs = xs.transpose(perm).reshape((n,) + M + (ci * s ** d,))
    G = _packed_wgrad(xs, dy, (A,) * d + (ci * s ** d, co), 1,
                      ((0, 0),) * d)
    G = G.reshape((A,) * d + (ci,) + (s,) * d + (co,))
    perm = []
    for j in range(d):
        perm += [j, d + 1 + j]
    perm += [d, 2 * d + 1]
    G = G.transpose(perm).reshape(tuple(A * s for _ in range(d)) + (ci, co))
    return G[tuple(slice(0, k) for _ in range(d))]


def _use_packed(x, w, stride, pads) -> bool:
    """Packed wgrad wins when the DYP canvas fits in few dot groups; with
    many groups the repeated reads of the (folded) input exceed what the
    conv emitter moves, so those shapes stay on the XLA path."""
    # Default OFF: measured end-to-end on the flagship (r3), the packed
    # path was a net REGRESSION — 710.4 s/1000 (5-D canvas + entry fold),
    # 610.6 s (2-D concat canvas, fold gated off) vs 505.8 s for XLA's
    # emitters — because XLA materialises the DYP canvases in transposed
    # layouts (~23 ms/step for one conv's canvases) and the gate-failed
    # big-C_out wgrads stay on the emitter anyway. The formulation stays
    # in-tree, exactness-tested, behind DPI_PACKED_WGRAD=1 (the per-op win
    # it targets is real: the 536->32 wgrad emitter runs at ~7% MXU).
    if os.environ.get("DPI_PACKED_WGRAD", "0") != "1":
        return False
    d = w.ndim - 2
    k = w.shape[0]
    U = tuple(x.shape[1 + i] + sum(pads[i]) for i in range(d))
    if stride > 1 and os.environ.get("DPI_FOLD_WGRAD", "0") != "1":
        # the fold's s^d-way space-to-depth transpose materialises as slow
        # strided copies on TPU (measured ~90 ms/step on the full-res entry
        # conv — worse than XLA's 19 ms emitter); off until it earns its keep
        return False
    if stride == 1:
        taps = int(np.prod(w.shape[:d]))
        nu = x.shape[0] * int(np.prod(U))
    else:
        a = -(-k // stride)
        taps = a ** d
        s_out = tuple((U[i] - k) // stride + 1 for i in range(d))
        m = tuple(max(s_out[i] + a - 1, -(-U[i] // stride))
                  for i in range(d))
        nu = x.shape[0] * int(np.prod(m))
    _, ngroups = _tap_groups(taps, nu, w.shape[-1], x.dtype.itemsize)
    return ngroups <= 4


def _use_pallas(x, w, stride, pads) -> bool:
    """Pallas wgrad (ops/pallas_wgrad.py): the contraction runs inside a
    kernel where no conv-emitter layout contract applies. Shape-gated to
    batch-1 stride-1 odd-cubic same-pad convs that fit VMEM un-chunked —
    exactly the flagship res-0 phase convs the profile blames."""
    if os.environ.get("DPI_PALLAS_WGRAD", "0") != "1":
        return False
    from .pallas_wgrad import wgrad_supported
    return wgrad_supported(tuple(x.shape), tuple(w.shape), stride,
                           tuple(pads), x.dtype.itemsize)


def _conv_same_bwd(stride, pads, res, dy):
    x, w = res
    if _use_pallas(x, w, stride, pads):
        from .pallas_wgrad import pallas_wgrad_s1
        _, pullback = jax.vjp(lambda xx: _fwd_conv(xx, w, stride, pads), x)
        dx, = pullback(dy)
        interpret = jax.default_backend() not in ("tpu", "axon")
        dw = pallas_wgrad_s1(x, dy, w.shape[0],
                             interpret=interpret).astype(w.dtype)
        return dx, dw
    if not _use_packed(x, w, stride, pads):
        _, pullback = jax.vjp(
            lambda xx, ww: _fwd_conv(xx, ww, stride, pads), x, w)
        return pullback(dy)
    # dx: XLA's standard conv transpose (the forward conv is dead code —
    # the pullback w.r.t. x does not use it, so XLA removes it)
    _, pullback = jax.vjp(lambda xx: _fwd_conv(xx, w, stride, pads), x)
    dx, = pullback(dy)
    wg = _packed_wgrad if stride == 1 else _folded_wgrad
    dw = wg(x, dy, w.shape, stride, pads).astype(w.dtype)
    return dx, dw


conv_same.defvjp(_conv_same_fwd, _conv_same_bwd)
