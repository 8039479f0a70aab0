"""Phase-space (space-to-depth) execution of small-channel convolutions.

The flagship MulResUnet3D spends its FLOPs in 3^d convs with 4..25 channels
(mulresunet.py Block widths: int(W*.167)/.333/.5 of W=1.67*16). XLA lowers a
conv as one matmul per kernel tap with K=C_in and N=C_out, so MXU efficiency
~ (C_in/128)*(C_out/128): measured 0.3-1.9 TF/s on v5e for these layers
(scripts/bench_phase_conv.py). Blocking B=2^d spatial phases into channels
makes every conv an EXACT equivalent with B*C_in -> B*C_out channels at
half resolution: 2^d*(k+1)^d/k^d = 2.37x (k=3, d=3) the FLOPs at ~8x the
lane utilisation on both matmul operands — measured 1.7-3.9x faster forward
and, more importantly, it fixes the backward dgrad whose contraction runs
over K=C_out.

Layout: channel-major / phase-minor — a phase tensor stores channel
``c*B + lin(phi)`` where ``phi`` is the per-dim parity vector of the original
voxel (C-order, last dim fastest). Channel concat of phase tensors then
equals the phase transform of the channel concat, and per-channel statistics
group ``B`` consecutive lanes.

Key identities (1-D; products of dims in N-D, all exact):

* entry (plain -> phase), same-pad k: ``out[2q+psi]=sum_t W[t] xp[2q+psi+t]``
  is a stride-2 VALID conv with kernel ``k+1`` and output channel (n,psi):
  ``W4[rho,c,(n,psi)] = W[rho-psi,c,n]`` — no explicit space-to-depth.
* interior (phase -> phase): with ``psi+t = 2s+phi``, a same-pad k conv is a
  kernel-(2S+1) conv (S=(p+1)//2) over the RAW phase tensor with ordinary
  zero padding (S,S): ``W'[s,(c,phi),(n,psi)] = W[2s+phi-psi+p,c,n]`` —
  the phase swap lives in the kernel's zero pattern, so no data-movement op
  ever materialises (the earlier ``phase_pad`` + VALID k//2+1 formulation
  was FLOP-minimal but its rank-8 layout views dominated the TPU profile).
* stride-2 exit (phase -> plain, half res): ``t = 2s+phi`` gives a
  kernel-(ceil(p/2)+p//2+1) conv with padding (ceil(p/2), p//2):
  ``W''[s,(c,phi),n] = W[2s+phi+p,c,n]``.
* nearest x2 upsample (plain half-res -> phase full-res) is a channel repeat;
  linear x2 upsample is a separable 2-tap stencil per dim (weights 1/4, 3/4,
  edge-clamped — jax.image.resize 'linear' half-pixel semantics).

Everything here is plain jax.numpy/lax — XLA maps the big-channel convs onto
the MXU natively; no Pallas required (the per-op study showed XLA already at
the lane-bound roofline, so the win is restructuring, not scheduling).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "space_to_depth", "depth_to_space", "phase_pad", "phase_kernel",
    "phase_paddings", "entry_kernel", "conv_dimension_numbers",
    "phase_entry_conv", "phase_conv", "phase_exit_conv",
    "upsample_into_phase", "phase_channels",
]


def conv_dimension_numbers(d: int) -> Tuple[str, str, str]:
    sp = "DHW"[-d:] if d <= 3 else "".join(chr(ord("A") + i) for i in range(d))
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def phase_channels(c_phase: int, d: int) -> int:
    """Original channel count of a phase tensor with ``c_phase`` lanes."""
    return c_phase // 2 ** d


# ----------------------------------------------------------------------
# layout transforms (used at region boundaries and in tests; the hot path
# avoids them via the fused entry/exit convs)
# ----------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, D1..Dd, C) -> (N, D1/2..Dd/2, C*2^d), channel-major layout."""
    d = x.ndim - 2
    n, c = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    shp = [n]
    for s in sp:
        shp += [s // 2, 2]
    x = x.reshape(shp + [c])
    perm = ([0] + [1 + 2 * i for i in range(d)] + [1 + 2 * d]
            + [2 + 2 * i for i in range(d)])
    x = x.transpose(perm)
    return x.reshape((n,) + tuple(s // 2 for s in sp) + (c * 2 ** d,))


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    d = x.ndim - 2
    n = x.shape[0]
    sp = x.shape[1:-1]
    c = x.shape[-1] // 2 ** d
    x = x.reshape((n,) + tuple(sp) + (c,) + (2,) * d)
    perm = [0]
    for i in range(d):
        perm += [1 + i, 2 + d + i]
    perm += [1 + d]
    x = x.transpose(perm)
    return x.reshape((n,) + tuple(2 * s for s in sp) + (c,))


def phase_pad(x: jnp.ndarray) -> jnp.ndarray:
    """Re-phase a phase tensor as if the PLAIN tensor were zero-padded by 1.

    phase(pad(plain,1))[p, phi] = phase(plain)[p - (1-phi), 1-phi] with zeros
    off the edge — per dim, the two phases swap, one of them shifted. Stays
    entirely in phase layout (pads + concats; no transposes).
    """
    d = x.ndim - 2
    n, cb = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    c = cb // 2 ** d
    x = x.reshape((n,) + tuple(sp) + (c,) + (2,) * d)
    for i in range(d):
        ax = 1 + i                # spatial axis i
        pax = 1 + d + 1 + i       # its phase axis
        hi = jax.lax.index_in_dim(x, 1, pax, keepdims=True)
        lo = jax.lax.index_in_dim(x, 0, pax, keepdims=True)
        pad_hi = [(0, 0)] * x.ndim
        pad_hi[ax] = (1, 0)       # new phi=0 channel: shifted old phi=1
        pad_lo = [(0, 0)] * x.ndim
        pad_lo[ax] = (0, 1)       # new phi=1 channel: old phi=0, zero at end
        x = jnp.concatenate([jnp.pad(hi, pad_hi), jnp.pad(lo, pad_lo)],
                            axis=pax)
    return x.reshape((n,) + tuple(s + 1 for s in sp) + (cb,))


# ----------------------------------------------------------------------
# weight transforms (trace-time gathers; differentiable, tiny)
# ----------------------------------------------------------------------

def _gather_kernel(w: jnp.ndarray, t: np.ndarray, valid: np.ndarray):
    wg = w[tuple(np.clip(t, 0, w.shape[0] - 1)[..., i]
                 for i in range(t.shape[-1]))]
    return jnp.where(jnp.asarray(valid)[..., None, None], wg, 0)


def phase_kernel(w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """(k^d, Cin, Cout) -> kernel over RAW phase-blocked inputs (no
    phase_pad; the phase swap is folded into the kernel's (phi, psi) zero
    pattern so the conv runs with ordinary spatial zero-padding — see
    :func:`phase_paddings`).

    The earlier formulation (kernel k//2+1, VALID, over ``phase_pad`` input)
    is the FLOP-minimal one, but materialising phase_pad costs rank-8
    layout views whose relayout copies dominated the real-TPU profile
    (25% of step time + most of another 30% in copies, vs 1.6% for the
    convs themselves). Trading kernel-2^d for kernel-3^d (3.4x the conv
    FLOPs at k=3) keeps the tensor in its native (N, *sp, C*B) tiling with
    zero data-movement ops.

    stride 1 -> (ks^d, Cin*B, Cout*B): y[q,psi] = sum_{s,phi}
    W[2s+phi-psi+p] x[q+s, phi], s in [-S, S], S = (p+1)//2.
    stride 2 -> (ke^d, Cin*B, Cout) (the phase->plain exit on the stride-2
    grid): y[m] = sum_{s,phi} W[2s+phi+p] x[m+s, phi], s in [-ceil(p/2),
    p//2].
    """
    d = w.ndim - 2
    k = w.shape[0]
    b = 2 ** d
    cin, cout = w.shape[-2], w.shape[-1]
    p = (k - 1) // 2
    phi = np.stack(np.meshgrid(*[np.arange(2)] * d, indexing="ij"),
                   -1).reshape(-1, d)
    if stride == 1:
        lo = hi = (p + 1) // 2
        ks = lo + hi + 1
        s = np.stack(np.meshgrid(*[np.arange(ks) - lo] * d,
                                 indexing="ij"), -1)
        t = (2 * s[..., None, None, :] + phi[(None,) * d][..., :, None, :]
             - phi[(None,) * d][..., None, :, :]) + p
        valid = ((t >= 0) & (t < k)).all(-1)
        wg = _gather_kernel(w, t, valid)          # (ks.., Bphi, Bpsi, Ci, Co)
        wg = jnp.moveaxis(wg, (-4, -3), (-3, -1))  # (ks.., Ci, Bphi, Co, Bpsi)
        return wg.reshape(wg.shape[:d] + (cin * b, cout * b))
    lo, hi = -(-p // 2), p // 2
    ke = lo + hi + 1
    s = np.stack(np.meshgrid(*[np.arange(ke) - lo] * d, indexing="ij"), -1)
    t = 2 * s[..., None, :] + phi[(None,) * d] + p
    valid = ((t >= 0) & (t < k)).all(-1)
    wg = _gather_kernel(w, t, valid)               # (ke.., Bphi, Ci, Co)
    wg = jnp.moveaxis(wg, -3, -2)                  # (ke.., Ci, Bphi, Co)
    return wg.reshape(wg.shape[:d] + (cin * b, cout))


def phase_paddings(k: int, stride: int = 1) -> Tuple[int, int]:
    """(lo, hi) spatial zero-padding pairing :func:`phase_kernel`."""
    p = (k - 1) // 2
    if stride == 1:
        lo = hi = (p + 1) // 2
        return lo, hi
    return -(-p // 2), p // 2


def entry_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(k^d, Cin, Cout) -> ((k+1)^d, Cin, Cout*B) stride-2 kernel producing
    phase-layout output directly from the (same-padded) plain input."""
    d = w.ndim - 2
    k = w.shape[0]
    b = 2 ** d
    cin, cout = w.shape[-2], w.shape[-1]
    rho = np.stack(np.meshgrid(*[np.arange(k + 1)] * d, indexing="ij"), -1)
    psi = np.stack(np.meshgrid(*[np.arange(2)] * d, indexing="ij"),
                   -1).reshape(-1, d)
    t = rho[..., None, :] - psi[(None,) * d]
    valid = ((t >= 0) & (t < k)).all(-1)
    wg = _gather_kernel(w, t, valid)               # ((k+1).., Bpsi, Ci, Co)
    wg = jnp.moveaxis(wg, -3, -1)                  # ((k+1).., Ci, Co, Bpsi)
    return wg.reshape(wg.shape[:d] + (cin, cout * b))


# ----------------------------------------------------------------------
# conv entry points (x: (N, *spatial, C) plain or (N, *spatial/2, C*B) phase)
# ----------------------------------------------------------------------

def phase_entry_conv(x: jnp.ndarray, w: jnp.ndarray,
                     depth: int = 1) -> jnp.ndarray:
    """Same-pad stride-1 conv, plain input -> phase output (half-res grid).

    ``depth > 1`` emits a deeper phase blocking (channels x ``2**(d*depth)``
    at 1/2**depth resolution): the fused entry conv produces depth 1 and
    the remaining levels fold via :func:`space_to_depth` (one relayout per
    extra depth — only at the plain->phase boundary)."""
    from .conv_vjp import conv_same
    d = w.ndim - 2
    p = (w.shape[0] - 1) // 2
    if p:
        x = jnp.pad(x, [(0, 0)] + [(p, p)] * d + [(0, 0)])
    y = conv_same(x, entry_kernel(w), 2, ((0, 0),) * d)
    for _ in range(depth - 1):
        y = space_to_depth(y)
    return y


def phase_conv(x: jnp.ndarray, w: jnp.ndarray, depth: int = 1) -> jnp.ndarray:
    """Same-pad stride-1 conv, phase input -> phase output (no phase_pad:
    plain conv with the swap-folded kernel, native layout throughout).

    ``depth > 1``: the fold composes — each application of
    :func:`phase_kernel` maps a same-pad stride-1 conv to its half-grid
    equivalent, so folding ``depth`` times runs the conv on a
    ``depth``-blocked tensor (channels x ``2**(d*depth)`` both sides) with
    zero data-movement ops."""
    from .conv_vjp import conv_same
    d = w.ndim - 2
    wk, k = w, w.shape[0]
    if depth == 0:  # degenerate: plain same-pad conv on a plain tensor
        p = (k - 1) // 2
        return conv_same(x, w, 1, ((p, p),) * d)
    for _ in range(depth):
        wk, k_prev = phase_kernel(wk, 1), k
        k = 2 * (((k - 1) // 2 + 1) // 2) + 1
    return conv_same(x, wk, 1, (phase_paddings(k_prev, 1),) * d)


def phase_exit_conv(x: jnp.ndarray, w: jnp.ndarray,
                    depth: int = 1) -> jnp.ndarray:
    """Same-pad STRIDE-2 conv, phase input -> plain output at half res.

    ``depth > 1``: unfolds to depth 1 first (:func:`depth_to_space`, one
    relayout per extra depth) then takes the fused stride-2 exit."""
    from .conv_vjp import conv_same
    d = w.ndim - 2
    for _ in range(depth - 1):
        x = depth_to_space(x)
    return conv_same(x, phase_kernel(w, 2), 1,
                     (phase_paddings(w.shape[0], 2),) * d)


# ----------------------------------------------------------------------
# upsampling into phase space (plain half-res -> phase full-res)
# ----------------------------------------------------------------------

def upsample_into_phase(x: jnp.ndarray, mode: str = "nearest") -> jnp.ndarray:
    """x2 upsample whose output is already phase-blocked: the output lives on
    the same array grid as ``x``, so 'nearest' is a pure channel repeat and
    'linear' a separable edge-clamped 2-tap stencil (no transposes)."""
    d = x.ndim - 2
    if mode == "nearest":
        return jnp.repeat(x, 2 ** d, axis=-1)
    n, c = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    y = x
    for i in range(d):
        ax = 1 + i
        pads_lo = [(0, 0)] * y.ndim
        pads_lo[ax] = (1, 0)
        pads_hi = [(0, 0)] * y.ndim
        pads_hi[ax] = (0, 1)
        prev = jnp.pad(y, pads_lo, mode="edge")
        nxt = jnp.pad(y, pads_hi, mode="edge")
        lo = 0.25 * jax.lax.slice_in_dim(prev, 0, y.shape[ax], axis=ax) \
            + 0.75 * y                       # psi_i = 0: q - 0.25
        hi = 0.75 * y \
            + 0.25 * jax.lax.slice_in_dim(nxt, 1, y.shape[ax] + 1, axis=ax)
        # appending each new psi axis at the end in dim order yields the
        # channel-major / psi-minor phase layout directly after the flatten
        y = jnp.stack([lo, hi], axis=y.ndim)
    return y.reshape((n,) + tuple(sp) + (c * 2 ** d,)).astype(x.dtype)
