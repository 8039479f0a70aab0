"""NN building blocks (flax linen, channels-last).

TPU-native re-design of the reference helper zoo
(/root/reference/architectures/base.py): activation registry (base.py:97-114),
same-pad conv factories with/without norm (base.py:117-216), center-crop
concatenation (base.py:289-362), resampler kernels (base.py:6-66, 219-286).

Design notes (TPU-first, not a translation):

* Layout is channels-last ((*spatial, C)), the native XLA/TPU conv layout;
  the reference's NCHW tensors are transposed once at the data boundary.
* ``Norm`` replaces torch BatchNorm{2,3}d. The reference always runs BN in
  training mode with batch size 1, which makes it exactly "normalise over the
  spatial axes per channel with learnable scale/bias" — no running statistics.
  Implementing that directly keeps per-patch statistics independent under
  ``vmap`` (no cross-patch mixing) and removes BN state from the train step.
* Convs use explicit symmetric padding ((k-1)//2 per side) so strided convs
  produce ceil(n/s) outputs at torch-compatible offsets.
* ``upsample`` does exact 2x duplication for 'nearest' (jnp.repeat — cheaper
  than a resize gather and XLA-fusible) and half-pixel-centres linear resize
  (= torch ``align_corners=False``) otherwise.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ----------------------------------------------------------------------
# activations (parity: base.py:97-114)
# ----------------------------------------------------------------------

def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name is None or name == "none":
        return lambda x: x
    table = {
        "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "ReLU": nn.relu,
        "ELU": nn.elu,
        "Tanh": jnp.tanh,
        "Sigmoid": nn.sigmoid,
        "Swish": nn.swish,  # base.py:373-383
    }
    if name not in table:
        raise NotImplementedError(f"unknown activation function '{name}'")
    return table[name]


# ----------------------------------------------------------------------
# normalisation
# ----------------------------------------------------------------------

class Norm(nn.Module):
    """Batch-of-1 BatchNorm: normalise over all non-channel axes.

    Equivalent to torch BatchNorm{2,3}d as the reference uses it (training
    mode, batch 1, running stats never consumed). eps matches torch (1e-5).
    Statistics always accumulate in float32 on the MXU (bf16 sums across
    millions of voxels lose too much precision); the affine applies in the
    input dtype.

    ``phase > 1`` operates on phase-blocked tensors (ops.phase_space): each
    true channel occupies ``phase`` consecutive lanes (channel-major layout),
    and its statistics pool the spatial axes AND its phase lanes — exactly
    the plain-space statistics, so the result is the phase transform of the
    plain Norm.
    """
    eps: float = 1e-5
    phase: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1] // self.phase
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # One-pass statistics: sum and sum-of-squares reduce in a SINGLE
        # multi-output fusion (one HBM read of x, f32 accumulation), then
        # var = E[x^2]-E[x]^2. (A dot_general formulation of the stats was
        # tried in r3 and measured SLOWER end-to-end — 528.5 vs 505.8
        # s/1000 — XLA canonicalises the M=1 dot back into a reduce while
        # the reshape boundary breaks the conv-epilogue fusion.)
        # The affine applies in the input dtype: the old f32 affine
        # materialised f32 copies of every activation (and f32 residuals
        # for the backward), visible as f32 relayout copies in the r3
        # profile. In phase mode the per-lane sums are folded across each
        # channel's ``phase`` lanes AFTER the reduction, and the affine
        # uses lane-repeated vectors — the tensor never leaves its
        # (…, C*B) lane tiling.
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        s1 = jnp.sum(xf, axis=axes)
        s2 = jnp.sum(xf * xf, axis=axes)
        n = float(np.prod(x.shape[:-1])) * self.phase
        if self.phase > 1:
            s1 = jnp.sum(s1.reshape(c, self.phase), axis=-1)
            s2 = jnp.sum(s2.reshape(c, self.phase), axis=-1)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        g = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * g
        if self.phase > 1:
            g = jnp.repeat(g, self.phase)
            b = jnp.repeat(b, self.phase)
        return x * g.astype(x.dtype) + b.astype(x.dtype)


# ----------------------------------------------------------------------
# convolution helpers (parity: base.py:117-216)
# ----------------------------------------------------------------------

def _same_pad(kernel_size: int) -> int:
    return (kernel_size - 1) // 2


class Conv(nn.Module):
    """Same-pad conv (torch-compatible symmetric padding), any spatial rank.

    ``dtype`` is the compute dtype (bfloat16 for the MXU fast path); params
    stay float32. ``phase_in``/``phase_out`` execute the SAME conv (same
    params, same math) on phase-blocked tensors (ops.phase_space) — the
    small-channel fast path on TPU:

      * plain -> phase: stride must be 1; lowers to a fused stride-2
        kernel-(k+1) conv emitting the phase layout directly.
      * phase -> phase: stride-1 conv with the swap-folded kernel
        (phase_space.phase_kernel zero pattern) and ordinary zero padding
        (phase_space.phase_paddings) over the raw (N, *sp, C*B) tensor;
        channels x 2^ndim on both sides. No phase-component views in the
        hot path.
      * phase -> plain: stride must be 2 (the natural exit — the stride-2
        output grid IS the phase grid).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    ndim: int = 2
    use_bias: bool = True
    pad: str = "zero"  # zero | reflection (base.py:129-159 conv_mod)
    dtype: Optional[jnp.dtype] = None
    phase_in: bool = False
    phase_out: bool = False
    phase_depth: int = 1  # phase blocking depth: channels x (2^ndim)^depth

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import phase_space as ps

        k, p = self.kernel_size, _same_pad(self.kernel_size)
        b = 2 ** (self.ndim * self.phase_depth)
        cin = x.shape[-1] // (b if self.phase_in else 1)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k,) * self.ndim + (cin, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        dt = self.dtype if self.dtype is not None else x.dtype
        xx = x.astype(dt)
        w = kernel.astype(dt)

        if self.phase_in or self.phase_out:
            assert self.pad == "zero", "phase conv supports zero padding only"
            if not self.phase_in:
                assert self.stride == 1
                y = ps.phase_entry_conv(xx, w, self.phase_depth)
            elif self.phase_out:
                assert self.stride == 1
                y = ps.phase_conv(xx, w, self.phase_depth)
            else:
                assert self.stride == 2, "phase->plain is the stride-2 exit"
                y = ps.phase_exit_conv(xx, w, self.phase_depth)
            if bias is not None:
                bb = jnp.repeat(bias, b) if self.phase_out else bias
                y = y + bb.astype(dt)
            return y

        if self.pad == "reflection" and p > 0:
            pads = [(0, 0)] + [(p, p)] * self.ndim + [(0, 0)]
            xx = jnp.pad(xx, pads, mode="reflect")
            padding = [(0, 0)] * self.ndim
        else:
            padding = [(p, p)] * self.ndim
        from ..ops.conv_vjp import conv_same
        y = conv_same(xx, w, self.stride, tuple(padding))
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class ConvNormAct(nn.Module):
    """conv -> Norm -> activation (parity: conv2dbn/conv3dbn, base.py:162-216)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    ndim: int = 2
    use_bias: bool = True
    act: str = "LeakyReLU"
    dtype: Optional[jnp.dtype] = None
    phase_in: bool = False
    phase_out: bool = False
    phase_depth: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv(self.features, self.kernel_size, self.stride, self.ndim,
                 self.use_bias, dtype=self.dtype, phase_in=self.phase_in,
                 phase_out=self.phase_out,
                 phase_depth=self.phase_depth)(x)
        x = Norm(phase=2 ** (self.ndim * self.phase_depth)
                 if self.phase_out else 1)(x)
        return get_activation(self.act)(x)


# ----------------------------------------------------------------------
# center-crop concat (parity: Concat/Concat3D, base.py:289-362)
# ----------------------------------------------------------------------

def center_crop_to(x: jnp.ndarray, spatial: Sequence[int]) -> jnp.ndarray:
    """Center-crop the spatial dims (all but last) of ``x`` to ``spatial``."""
    slices = []
    for dim, tgt in zip(x.shape[:-1], spatial):
        d = (dim - tgt) // 2
        slices.append(slice(d, d + tgt))
    slices.append(slice(None))
    return x[tuple(slices)]


def concat_crop(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concat along channels after center-cropping spatial dims to the min."""
    spatial = [min(x.shape[d] for x in xs) for d in range(xs[0].ndim - 1)]
    return jnp.concatenate([center_crop_to(x, spatial) for x in xs], axis=-1)


# ----------------------------------------------------------------------
# resampling
# ----------------------------------------------------------------------

def upsample(x: jnp.ndarray, factor: int = 2, mode: str = "nearest") -> jnp.ndarray:
    """Upsample the spatial dims (all but last channel dim) by ``factor``.

    'nearest' duplicates samples (== torch Upsample nearest for integer
    factors); 'bilinear'/'trilinear'/'linear' use half-pixel linear resize
    (== torch align_corners=False).
    """
    ndim = x.ndim - 1
    if mode == "nearest":
        for ax in range(ndim):
            x = jnp.repeat(x, factor, axis=ax)
        return x
    new_shape = tuple(s * factor for s in x.shape[:-1]) + (x.shape[-1],)
    return jax.image.resize(x, new_shape, method="linear")


def downsample_pool(x: jnp.ndarray, factor: int, mode: str) -> jnp.ndarray:
    """avg/max pooling downsample (parity: base.py:129-146 conv_mod modes)."""
    ndim = x.ndim - 1
    window = (factor,) * ndim
    x4 = x[None]
    if mode == "avg":
        y = nn.avg_pool(x4, window, window)
    elif mode == "max":
        y = nn.max_pool(x4, window, window)
    else:
        raise ValueError(f"unknown pooling mode '{mode}'")
    return y[0]


def symmetry(x: jnp.ndarray, axes: Sequence[int] = (-3, -2)) -> jnp.ndarray:
    """Symmetrise over the two given (spatial) axes: (x + x^T)/2
    (parity: Symmetry module, base.py:365-370, which acts on the last two
    NCHW dims; channels-last spatial dims default to (-3, -2))."""
    return (x + jnp.swapaxes(x, axes[0], axes[1])) / 2


def resample_kernel_1d(factor: int, kernel_type: str,
                       support: Optional[int] = None,
                       sigma: Optional[float] = None) -> jnp.ndarray:
    """1-D half-phase anti-aliasing taps: lanczos / gauss / box
    (parity: get_kernel, base.py:6-66, separable form). Normalised to
    unit sum."""
    if kernel_type.startswith("lanczos"):
        support = support or int(kernel_type[-1]) if kernel_type[-1].isdigit() \
            else (support or 2)
        return lanczos_kernel_1d(factor, support)
    if kernel_type == "box":
        w = jnp.ones((factor,), jnp.float32)
        return w / jnp.sum(w)
    if kernel_type.startswith("gauss"):
        sigma = sigma if sigma is not None else 0.5
        width = 2 * factor + 1
        n = jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2.0
        w = jnp.exp(-(n ** 2) / (2 * sigma * sigma))
        return w / jnp.sum(w)
    raise ValueError(f"wrong resampling kernel name '{kernel_type}'")


def lanczos_kernel_1d(factor: int, support: int) -> jnp.ndarray:
    """1-D Lanczos resampling taps (parity: get_kernel, base.py:33-58).

    Half-phase (phase=0.5) taps of width ``support * 2 * factor`` used by the
    separable ``Downsampler`` path; normalised to unit sum.
    """
    width = 2 * support * factor
    # half-phase sample positions relative to the kernel center, in units of
    # the downsampling factor
    center = (width + 1) / 2.0
    i = jnp.arange(1, width + 1, dtype=jnp.float32)
    d = jnp.abs(i + 0.5 - center) / factor
    pi = jnp.pi
    val = jnp.where(
        d == 0, 1.0,
        support * jnp.sin(pi * d) * jnp.sin(pi * d / support) / (pi * pi * d * d))
    return val / jnp.sum(val)


def lanczos_downsample(x: jnp.ndarray, factor: int, support: int = 2) -> jnp.ndarray:
    """Separable Lanczos anti-aliased downsample of the spatial dims.

    TPU-native replacement for the reference ``Downsampler`` (base.py:219-286):
    instead of an n_planes x n_planes conv with a diagonal kernel, apply the
    separable 1-D taps per axis as depthwise convs with replicate padding
    (preserve_size=True semantics).
    """
    taps = lanczos_kernel_1d(factor, support).astype(x.dtype)
    width = taps.shape[0]
    pad = (width - factor) // 2
    ndim = x.ndim - 1
    for ax in range(ndim):
        x = jnp.moveaxis(x, ax, -2)  # (..., L, C)
        lead = x.shape[:-2]
        L, C = x.shape[-2], x.shape[-1]
        xr = x.reshape((-1, L, C))
        xr = jnp.pad(xr, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        kern = jnp.tile(taps[:, None, None], (1, 1, C))  # (W, 1, C) depthwise
        y = jax.lax.conv_general_dilated(
            xr, kern, window_strides=(factor,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C)
        x = y.reshape(lead + (y.shape[1], C))
        x = jnp.moveaxis(x, -2, ax)
    return x


class Dropout(nn.Module):
    """Dropout active whenever rate > 0 (reference nets always train)."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.rate <= 0.0:
            return x
        return nn.Dropout(self.rate, deterministic=False)(x)
