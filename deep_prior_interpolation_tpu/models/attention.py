"""Attention modules and attention U-Nets (2D).

Capability parity with /root/reference/architectures/attention.py: CBAM
channel gate (max+avg pooled shared MLP, attention.py:8-28), spatial gate
(:36-54), CBAM (:57-68), additive grid-attention gate (GridAttentionBlock,
:86-113), the plain attention U-Net (:116-194, library component unused by
the factory) and the grid-gated attention MultiRes U-Net (AttMulResUnet2D,
:197-262) which the factory exposes as ``--net attmultiunet``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv, ConvNormAct, Dropout, Norm, concat_crop, \
    get_activation, upsample
from .mulresunet import MultiResBlock, multires_width


class ChannelGate(nn.Module):
    """SE-style channel gate on max+avg pooled features (attention.py:8-28)."""
    reduction_ratio: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        mlp = nn.Sequential([
            nn.Dense(c // self.reduction_ratio), nn.relu, nn.Dense(c)])
        x_max = mlp(jnp.max(x, axis=axes))
        x_avg = mlp(jnp.mean(x, axis=axes))
        gate = nn.sigmoid(x_max + x_avg)
        return x * gate.reshape(gate.shape[:1] + (1,) * len(axes) + (c,))


class SpatialGate(nn.Module):
    """Spatial gate on channel max|mean pool (attention.py:36-54)."""
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.concatenate([jnp.max(x, axis=-1, keepdims=True),
                                  jnp.mean(x, axis=-1, keepdims=True)], -1)
        g = Conv(1, self.kernel_size, ndim=x.ndim - 2)(pooled)
        g = nn.sigmoid(Norm()(g))
        return x * g


class CBAM(nn.Module):
    """Convolutional block attention module (attention.py:57-68)."""
    reduction_ratio: int = 16
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return SpatialGate(self.kernel_size)(ChannelGate(self.reduction_ratio)(x))


class GridAttentionBlock(nn.Module):
    """Additive grid attention over a skip feature (attention.py:86-113).

    ``g`` is the coarser gating signal, ``x`` the skip feature one scale
    finer; returns ``x`` weighted by the upsampled attention map.
    """
    f_int: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2
        g1 = Norm()(Conv(self.f_int, 1, ndim=ndim)(g))
        x1 = Norm()(Conv(self.f_int, 3, stride=2, ndim=ndim)(x))
        # crop to common spatial extent before the add (odd sizes)
        spatial = [min(a, b) for a, b in zip(g1.shape[1:-1], x1.shape[1:-1])]
        g1 = g1[(slice(None),) + tuple(slice(0, s) for s in spatial)]
        x1 = x1[(slice(None),) + tuple(slice(0, s) for s in spatial)]
        psi = nn.relu(g1 + x1)
        psi = nn.sigmoid(Conv(1, 1, ndim=ndim)(psi))
        psi = jnp.stack([upsample(p, 2, "bilinear") for p in psi])
        spatial = [min(a, b) for a, b in zip(psi.shape[1:-1], x.shape[1:-1])]
        sl = (slice(None),) + tuple(slice(0, s) for s in spatial)
        return x[sl] * psi[sl]


class AttMulResUnet(nn.Module):
    """Attention MultiRes U-Net, 2D (attention.py:197-262)."""
    out_channels: int = 1
    ndim: int = 2  # 2D only; kept for factory-signature symmetry
    filters: Sequence[int] = (16, 32, 64, 128, 256)
    alpha: float = 1.67
    act: str = "LeakyReLU"
    last_act: Optional[str] = None
    use_bias: bool = True
    upsample_mode: str = "nearest"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.ndim == 2, "AttMulResUnet is 2D-only (attention.py:197)"
        n = len(self.filters)
        bkw = dict(ndim=2, alpha=self.alpha, act=self.act,
                   use_bias=self.use_bias, drop=self.dropout)
        widths = [multires_width(f, self.alpha) for f in self.filters]

        # encoder (attention.py:251-255)
        feats = []
        h = x
        for i in range(n):
            if i > 0:
                h = Conv(h.shape[-1], 3, stride=2, ndim=2,
                         use_bias=self.use_bias)(h)
                h = Dropout(self.dropout)(get_activation(self.act)(Norm()(h)))
            h = MultiResBlock(self.filters[i], **bkw)(h)
            feats.append(h)

        # decoder with grid-gated skips (attention.py:257-260)
        for i in range(1, n):
            g = feats[-i]          # coarser signal
            s = feats[-(i + 1)]    # skip one scale finer
            att = GridAttentionBlock(self.filters[-i])(g, s)
            up = jnp.stack([upsample(gg, 2, self.upsample_mode) for gg in g])
            h = concat_crop([att, up])
            h = MultiResBlock(self.filters[-(i + 1)], **bkw)(h)
            feats[-(i + 1)] = h

        out = Conv(self.out_channels, 1, ndim=2, use_bias=self.use_bias)(h)
        last = None if (isinstance(self.last_act, str)
                        and self.last_act.lower() == "none") else self.last_act
        if last is not None:
            out = get_activation(last)(out)
        return out


class AttentionUnet(nn.Module):
    """Plain U-Net with optional CBAM gates (attention.py:116-194).

    Library component (not reachable from the factory in the reference
    either); max-pool encoder, bilinear-upsample decoder, 48->256 widths.
    """
    out_channels: int = 1
    act: str = "LeakyReLU"
    use_bias: bool = True
    att: str = "cbam"
    reduce_ratio: int = 4

    def _att(self, x):
        if self.att == "cbam":
            return CBAM(self.reduce_ratio, 7)(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(ndim=2, act=self.act, use_bias=self.use_bias)

        def block(h, f):
            h = ConvNormAct(f, 3, **kw)(h)
            return ConvNormAct(f, 3, **kw)(h)

        def pool(h):
            return nn.max_pool(h, (2, 2), (2, 2))

        d1 = self._att(block(x, 16))
        d2 = self._att(block(pool(d1), 32))
        d3 = self._att(block(pool(d2), 64))
        d4 = self._att(block(pool(d3), 128))
        bott = block(pool(d4), 256)
        up4 = jnp.stack([upsample(b, 2, "bilinear") for b in bott])

        def up_block(skip, up, f):
            h = concat_crop([skip, up])
            h = self._att(block(h, f))
            return jnp.stack([upsample(hh, 2, "bilinear") for hh in h])

        u3 = up_block(d4, up4, 128)
        u2 = up_block(d3, u3, 64)
        u1 = up_block(d2, u2, 32)
        h = concat_crop([d1, u1])
        h = self._att(block(h, 16))
        return Conv(self.out_channels, 3, ndim=2, use_bias=self.use_bias)(h)
