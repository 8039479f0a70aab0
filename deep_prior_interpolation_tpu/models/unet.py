"""Plain U-Net.

Capability parity with /root/reference/architectures/unet.py:84-187 (the
working ``UNet``; the reference factory's 2D 'unet' branch calls the
undefined ``UNetMod`` and crashes, architectures/__init__.py:13 — this
module is what that branch should resolve to). Double-conv blocks with
instance norm on the way down, max-pool downsampling, deconv-or-upsample
up path with center-crop skip concat, optional ``concat_x`` multiscale
input injection and ``more_layers`` extra depth.

Rank-polymorphic (the reference is 2D-only; 3D comes for free here).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv, Dropout, Norm, concat_crop, get_activation, upsample


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial norm, no affine params
    (== torch nn.InstanceNorm2d defaults, unet.py:93)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps)


class UNetConv(nn.Module):
    """Double conv block (unetConv, unet.py:10-35)."""
    features: int
    ndim: int
    act: str
    use_bias: bool
    norm: bool = True
    drop: float = 0.0

    @nn.compact
    def __call__(self, x):
        a = get_activation(self.act)
        for _ in range(2):
            x = Conv(self.features, 3, ndim=self.ndim, use_bias=self.use_bias)(x)
            if self.norm:
                x = InstanceNorm()(x)
            x = Dropout(self.drop)(a(x))
        return x


class UNet(nn.Module):
    """U-Net (unet.py:84-187)."""
    out_channels: int = 1
    ndim: int = 2
    filters: Sequence[int] = (16, 32, 64, 128, 256)
    more_layers: int = 0
    concat_x: bool = False
    act: str = "ReLU"
    last_act: Optional[str] = None
    use_bias: bool = True
    upsample_mode: str = "nearest"  # 'deconv' | 'nearest' | 'bilinear'
    dropout: float = 0.0

    def _pool(self, x, window=2):
        return nn.max_pool(x, (window,) * self.ndim, (window,) * self.ndim)

    def _avg(self, x):
        return nn.avg_pool(x, (2,) * self.ndim, (2,) * self.ndim)

    def _up(self, x, features):
        if self.upsample_mode == "deconv":
            return nn.ConvTranspose(features, (4,) * self.ndim,
                                    strides=(2,) * self.ndim, padding="SAME",
                                    use_bias=self.use_bias)(x)
        y = jnp.stack([upsample(h, 2, self.upsample_mode) for h in x])
        return Conv(features, 3, ndim=self.ndim, use_bias=self.use_bias)(y)

    @nn.compact
    def __call__(self, x):
        f = list(self.filters)
        kw = dict(ndim=self.ndim, act=self.act, use_bias=self.use_bias,
                  drop=self.dropout)
        n_down = 4 + self.more_layers

        # multiscale raw-input pyramid for concat_x (unet.py:139-143)
        downsampled = [x]
        for _ in range(n_down):
            downsampled.append(self._avg(downsampled[-1]))

        def maybe_cat(h, i):
            return concat_crop([h, downsampled[i]]) if self.concat_x else h

        h = UNetConv(f[0] - (x.shape[-1] if self.concat_x else 0),
                     norm=True, **kw)(x)
        h = maybe_cat(h, 0)
        skips = [h]
        for i in range(1, 5):
            h = self._pool(h)
            h = Dropout(self.dropout)(h)
            h = UNetConv(f[i] - (x.shape[-1] if self.concat_x else 0),
                         norm=True, **kw)(h)
            h = Dropout(self.dropout)(h)
            h = maybe_cat(h, i)
            skips.append(h)
        for j in range(self.more_layers):
            h = self._pool(h)
            h = UNetConv(f[4], norm=True, **kw)(h)
            h = maybe_cat(h, 5 + j)
            skips.append(h)

        # up path (unetUp, unet.py:53-81): upsample, crop skip, double conv
        up = skips[-1]
        for j in range(self.more_layers):
            up = self._up(up, f[4])
            up = UNetConv(f[4], norm=False, **kw)(concat_crop(
                [up, skips[-(2 + j)]]))
        for i in range(4, 0, -1):
            up = self._up(up, f[i - 1])
            up = UNetConv(f[i - 1], norm=False, **kw)(concat_crop(
                [up, skips[i - 1]]))
            up = Dropout(self.dropout)(up)

        out = Conv(self.out_channels, 1, ndim=self.ndim,
                   use_bias=self.use_bias)(up)
        last = None if (isinstance(self.last_act, str)
                        and self.last_act.lower() == "none") else self.last_act
        if last is not None:
            out = get_activation(last)(out)
        return out
