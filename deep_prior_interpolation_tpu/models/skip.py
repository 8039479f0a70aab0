"""Skip net — the classic Deep-Image-Prior autoencoder.

Capability parity with the reference ``Skip``/``Skip3D``
(/root/reference/architectures/skip.py:5-254): per scale a 1x1-conv skip
branch plus a deeper stride-2 path (two convs), Norm everywhere, optional
1x1 refinement convs on the way up, nearest/linear upsampling, avg/max/
lanczos downsampling modes (base.py conv_mod), reflection or zero padding.

Rank-polymorphic flax module (2D and 3D in one class) in channels-last
layout, recursive over scales like
:class:`~deep_prior_interpolation_tpu.models.mulresunet.MulResUnet`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (Conv, Dropout, Norm, concat_crop, downsample_pool,
                     get_activation, lanczos_downsample, upsample)


def _per_scale(v, n):
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * n


class SkipNet(nn.Module):
    """2D/3D DIP skip autoencoder (skip.py:51-151 / :154-254)."""
    out_channels: int = 1
    ndim: int = 2
    filters: Sequence[int] = (16, 32, 64, 128, 128)
    skip: Sequence[int] = (4, 4, 4, 4, 4)
    filter_size_down: Union[int, Sequence[int]] = 3
    filter_size_up: Union[int, Sequence[int]] = 3
    filter_skip_size: int = 1
    act: str = "LeakyReLU"
    last_act: Optional[str] = None
    use_bias: bool = True
    pad: str = "zero"
    upsample_mode: Union[str, Sequence[str]] = "nearest"
    downsample_mode: Union[str, Sequence[str]] = "stride"
    need1x1_up: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # The reference requires len(down)==len(up)==len(skip) (skip.py:68);
        # the CLI passes filters (5) and skip (4) lists, so pad skip with its
        # last entry to keep the flag surface usable.
        skip_ch = list(self.skip)
        while len(skip_ch) < len(self.filters):
            skip_ch.append(skip_ch[-1] if skip_ch else 4)

        n = len(self.filters)
        up_modes = _per_scale(self.upsample_mode, n)
        down_modes = _per_scale(self.downsample_mode, n)
        fs_down = _per_scale(self.filter_size_down, n)
        fs_up = _per_scale(self.filter_size_up, n)
        act = get_activation(self.act)

        def conv_block(h, features, k, stride=1, down_mode="stride"):
            """conv_mod semantics (base.py:129-159): pooling/lanczos modes
            turn the strided conv into stride-1 + explicit downsample."""
            pool = None
            s = stride
            if stride != 1 and down_mode != "stride":
                pool, s = down_mode, 1
            h = Conv(features, k, stride=s, ndim=self.ndim,
                     use_bias=self.use_bias, pad=self.pad)(h)
            if pool in ("avg", "max"):
                h = downsample_pool(h[0], stride, pool)[None] if h.shape[0] == 1 \
                    else jnp.stack([downsample_pool(hh, stride, pool) for hh in h])
            elif pool in ("lanczos2", "lanczos3"):
                support = 2 if pool == "lanczos2" else 3
                h = jnp.stack([lanczos_downsample(hh, stride, support) for hh in h])
            return h

        def level(i: int, h: jnp.ndarray) -> jnp.ndarray:
            # skip branch (skip.py:102-106)
            s = None
            if skip_ch[i] != 0:
                s = conv_block(h, skip_ch[i], self.filter_skip_size)
                s = Dropout(self.dropout)(act(Norm()(s)))
            # deeper: stride-2 conv + conv (skip.py:108-117)
            d = conv_block(h, self.filters[i], fs_down[i], stride=2,
                           down_mode=down_modes[i])
            d = Dropout(self.dropout)(act(Norm()(d)))
            d = conv_block(d, self.filters[i], fs_down[i])
            d = Dropout(self.dropout)(act(Norm()(d)))
            if i < n - 1:
                d = level(i + 1, d)
            d = upsample(d[0], 2, up_modes[i])[None] if d.shape[0] == 1 else \
                jnp.stack([upsample(dd, 2, up_modes[i]) for dd in d])
            y = concat_crop([s, d]) if s is not None else d
            y = Norm()(y)  # post-concat Norm (skip.py:100)
            y = conv_block(y, self.filters[i], fs_up[i])
            y = Dropout(self.dropout)(act(Norm()(y)))
            if self.need1x1_up:  # (skip.py:136-140)
                y = conv_block(y, self.filters[i], 1)
                y = Dropout(self.dropout)(act(Norm()(y)))
            return y

        x = level(0, x)
        x = conv_block(x, self.out_channels, 1)
        last = None if (isinstance(self.last_act, str)
                        and self.last_act.lower() == "none") else self.last_act
        if last is not None:
            x = get_activation(last)(x)
        return x
