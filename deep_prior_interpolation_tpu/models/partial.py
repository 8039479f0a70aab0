"""Partial-convolution U-Net (mask-aware inpainting net).

Capability parity with /root/reference/architectures/partial_unet.py: the
mask-renormalising partial conv (Partial2DConv/Partial3DConv.forward,
partial_unet.py:42-80/:119-157 — output scaled by the valid-mask count under
the kernel, bias re-added outside the normalisation, holes zeroed, mask
updated), the 5-level 48-channel encoder + conv/nearest-upsample decoder
(PartialUNet :190-245, PartialUNet3D :248-303).

TPU-first: instead of a frozen all-ones ``mask_conv`` weight tensor (a dense
conv with constant kernel), the valid-count is computed with a kernel-less
``reduce_window`` sum scaled by the channel count — identical result, no
parameters, no wasted MXU work. Mask-carrying is explicit data flow (the
mask is threaded through the module), which composes with jit/vmap with no
frozen-parameter bookkeeping.

NOTE (reference defect, SURVEY §2.4 #8): the reference driver calls
``net(input_)`` single-arg so ``--net part`` crashes there. Here the solver
detects mask-taking models and passes ``(x, mask)``; the network mask is the
data sampling mask broadcast to the input-noise channel depth.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv, Dropout, Norm, concat_crop, get_activation, upsample


class PartialConv(nn.Module):
    """Mask-renormalising conv, any spatial rank (partial_unet.py:6-157)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    ndim: int = 2
    use_bias: bool = False
    use_norm: bool = True
    act: str = "ReLU"
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        k, p = self.kernel_size, (self.kernel_size - 1) // 2
        conv = nn.Conv(self.features, (k,) * self.ndim,
                       strides=(self.stride,) * self.ndim,
                       padding=[(p, p)] * self.ndim, use_bias=False,
                       kernel_init=nn.initializers.kaiming_normal())
        out = conv(x * mask)

        # valid-count under the kernel: sum-pool of the mask times in-channels
        # (== the reference's frozen all-ones mask_conv, partial_unet.py:28,49)
        counts = jax.lax.reduce_window(
            jnp.sum(mask, axis=-1, keepdims=True), 0.0, jax.lax.add,
            (1,) + (k,) * self.ndim + (1,),
            (1,) + (self.stride,) * self.ndim + (1,),
            [(0, 0)] + [(p, p)] * self.ndim + [(0, 0)])
        holes = counts == 0
        counts = jnp.where(holes, 1.0, counts)

        # renormalise the bias-free response, then re-add the bias
        # (partial_unet.py:51-65)
        out = out / counts
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), x.dtype)
        out = jnp.where(holes, 0.0, out)
        new_mask = jnp.broadcast_to((~holes).astype(x.dtype), out.shape)

        if self.use_norm:
            out = Norm()(out)
        out = get_activation(self.act)(out)
        out = Dropout(self.drop)(out)
        return out, new_mask


class PartialBlock(nn.Module):
    """partial conv -> stride-2 conv on both feature and mask
    (Partial2DBlock/Partial3DBlock, partial_unet.py:160-187)."""
    features: int
    ndim: int
    use_norm: bool
    act: str
    use_bias: bool
    drop: float

    @nn.compact
    def __call__(self, x, mask):
        x, mask = PartialConv(self.features, 3, 1, self.ndim,
                              use_bias=False, use_norm=self.use_norm,
                              act=self.act, drop=self.drop)(x, mask)
        down = Conv(self.features, 3, stride=2, ndim=self.ndim,
                    use_bias=self.use_bias)
        x, mask = down(x), down(mask)
        x, mask = Dropout(self.drop)(x), Dropout(self.drop)(mask)
        return x, mask


class PartialUNet(nn.Module):
    """5-level partial-conv U-Net, 2D/3D (partial_unet.py:190-303)."""
    out_channels: int = 1
    ndim: int = 2
    use_norm: bool = True
    act: str = "LeakyReLU"
    use_bias: bool = True
    dropout: float = 0.0
    takes_mask: bool = True  # solver dispatch marker

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        kw = dict(ndim=self.ndim, use_norm=self.use_norm, act=self.act,
                  use_bias=self.use_bias, drop=self.dropout)
        downs = []
        h, m = x, mask
        for _ in range(5):
            h, m = PartialBlock(48, **kw)(h, m)
            downs.append(h)

        def dec(h, f1=96, f2=96):
            h = Conv(f1, 3, ndim=self.ndim, use_bias=False)(h)
            h = Conv(f2, 3, ndim=self.ndim, use_bias=False)(h)
            h = jnp.stack([upsample(hh, 2, "nearest") for hh in h])
            return Dropout(self.dropout)(h)

        up = jnp.stack([upsample(hh, 2, "nearest") for hh in downs[4]])
        up = dec(concat_crop([downs[3], up]))
        up = dec(concat_crop([downs[2], up]))
        up = dec(concat_crop([downs[1], up]))
        up = dec(concat_crop([downs[0], up]))

        h = concat_crop([x, up])
        h = Conv(96, 3, ndim=self.ndim, use_bias=False)(h)
        h = Conv(64, 3, ndim=self.ndim, use_bias=False)(h)
        h = Conv(32, 3, ndim=self.ndim, use_bias=False)(h)
        return Conv(self.out_channels, 3, ndim=self.ndim, use_bias=False)(h)
