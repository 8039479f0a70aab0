"""Pallas TPU kernels for the DIP hot loop.

The per-iteration non-conv work of the solver reads three full volumes
(output, target, mask) several times: masked loss (main.py:161), SNR and
Pearson sums (utils/metrics.py:6-44). On a (256,128,128) float32 patch that
is ~200 MB of HBM traffic per pass. :func:`fused_loss_metrics` performs ALL
of these reductions in a single streaming pass: one grid over 2-D tiles,
eight running sums accumulated in a VMEM accumulator (TPU grid steps execute
sequentially per core, so ``acc += ...`` across grid steps is well-defined).

Wired into the scanned solver step via ``Config(fused_loss=True)``
(StepSettings.fused_loss): the step then gets loss, SNR and Pearson from
this one pass instead of three separate jnp reductions. Off-TPU backends run
the kernel in interpret mode (StepSettings.fused_interpret).

The backward pass of the loss is analytic (d/d_out of mean|(o-t)m| or
mean(((o-t)m)^2)), wired as a ``jax.custom_vjp`` so autodiff never
differentiates through the kernel.

Inputs are flattened and zero-padded to tile multiples; padded lanes carry
(out=0, img=0, mask=0) and therefore contribute zero to every sum except the
element count, which uses the true size.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile: (8, 128) f32 minimum; use several sublanes for bandwidth
_TILE_ROWS = 256
_TILE_COLS = 128
_TILE = _TILE_ROWS * _TILE_COLS


def _metrics_kernel(out_ref, img_ref, mask_ref, acc_ref):
    """Accumulates one statistic per SUBLANE of an (8, 128) block: scalar
    stores to VMEM are not lowerable on TPU (Mosaic: "Cannot store scalars
    to VMEM"), so each tile reduces along sublanes only and the final
    cross-lane sum happens outside the kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    o = out_ref[:]
    t = img_ref[:]
    m = mask_ref[:]
    d = (o - t) * m
    r = t - o
    stats = jnp.stack([
        jnp.sum(jnp.abs(d), axis=0),   # masked L1 sum
        jnp.sum(d * d, axis=0),        # masked L2 sum
        jnp.sum(t * t, axis=0),        # SNR numerator
        jnp.sum(r * r, axis=0),        # SNR denominator
        jnp.sum(t, axis=0),            # pcorr sums
        jnp.sum(o, axis=0),
        jnp.sum(o * o, axis=0),
        jnp.sum(t * o, axis=0),
    ], axis=0)                         # (8, _TILE_COLS): full-block store
    acc_ref[:] += stats


def _pad_flat(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    flat = x.reshape(-1).astype(jnp.float32)
    return jnp.pad(flat, (0, n_pad - flat.shape[0])).reshape(-1, _TILE_COLS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_sums(out, img, mask, interpret: bool = False) -> jnp.ndarray:
    n = int(np.prod(out.shape))
    n_pad = -(-n // _TILE) * _TILE
    rows = n_pad // _TILE_COLS
    grid = rows // _TILE_ROWS
    o2, t2, m2 = (_pad_flat(v, n_pad) for v in (out, img, mask))
    spec = pl.BlockSpec((_TILE_ROWS, _TILE_COLS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        _metrics_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((8, _TILE_COLS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, _TILE_COLS), jnp.float32),
        interpret=interpret,
    )(o2, t2, m2)
    return jnp.sum(acc, axis=1)


def fused_loss_metrics(out: jnp.ndarray, img: jnp.ndarray, mask: jnp.ndarray,
                       loss: str = "mae",
                       interpret: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """(loss, {'snr', 'pcorr', 'mse', 'mae'}) in one HBM pass.

    Differentiable in ``out`` (custom VJP); ``img``/``mask`` are data.
    """
    n = float(np.prod(out.shape))
    s = _loss_sums(out, img, mask, interpret)
    mae_v = s[0] / n
    mse_v = s[1] / n
    snr_v = 10.0 * jnp.log10(s[2] / s[3])
    mean_t = s[4] / n
    mean_o = s[5] / n
    cov = s[7] / n - mean_t * mean_o
    var_t = s[2] / n - mean_t * mean_t
    var_o = s[6] / n - mean_o * mean_o
    pcorr_v = cov / jnp.sqrt(var_t * var_o)
    loss_v = mae_v if loss in ("mae", "l1") else mse_v
    return loss_v, {"snr": snr_v, "pcorr": pcorr_v, "mae": mae_v, "mse": mse_v}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _loss_sums(out, img, mask, interpret):
    return _fused_sums(out, img, mask, interpret)


def _loss_sums_fwd(out, img, mask, interpret):
    return _fused_sums(out, img, mask, interpret), (out, img, mask)


def _loss_sums_bwd(interpret, res, g):
    out, img, mask = res
    n_shape = out.shape
    d = (out - img) * mask
    # d/d_out of each sum that depends on out:
    #   s0 = sum|d|          -> sign(d) * mask
    #   s1 = sum d^2         -> 2 d mask
    #   s3 = sum (t-o)^2     -> -2 (t-o)
    #   s5 = sum o           -> 1
    #   s6 = sum o^2         -> 2 o
    #   s7 = sum t o         -> t
    grad = (g[0] * jnp.sign(d) * mask
            + g[1] * 2.0 * d * mask
            + g[3] * (-2.0) * (img - out)
            + g[5] * jnp.ones_like(out)
            + g[6] * 2.0 * out
            + g[7] * img)
    return grad.astype(out.dtype), None, None


_loss_sums.defvjp(_loss_sums_fwd, _loss_sums_bwd)
