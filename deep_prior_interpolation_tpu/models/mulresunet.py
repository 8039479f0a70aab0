"""Multi-resolution U-Net — the flagship DIP architecture.

Capability parity with the reference ``MulResUnet``/``MulResUnet3D``
(/root/reference/architectures/mulresunet.py:116-259): inception-style
multi-resolution encoder/decoder blocks (Block2d/Block3d, mulresunet.py:11-36
and :67-96), residual skip paths (ResPath, :39-64/:99-113), stride-2 conv
downsampling, nearest/linear x2 upsampling, and the 1x1 (2D) / 3x3 (3D)
output head (:178/:252).

TPU-first design: a single rank-polymorphic flax module in channels-last
layout built as an explicit recursion over scales (the reference builds a
nested ``nn.Sequential`` imperatively); all shapes are static under jit, and
odd sizes survive the x2 ladder through center-crop concat
(``blocks.concat_crop``), matching the reference's Concat semantics
(base.py:289-362).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (Conv, ConvNormAct, Dropout, Norm, concat_crop,
                     get_activation, upsample)


def multires_width(u: int, alpha: float = 1.67) -> int:
    """Output channels of a multi-res block (mulresunet.py:15)."""
    w = alpha * u
    return int(w * 0.167) + int(w * 0.333) + int(w * 0.5)


class MultiResBlock(nn.Module):
    """Chained 3x3 convs concat + 1x1 shortcut (Block2d/Block3d).

    ``extra_norm`` adds the two Norms the 3D variant has around the residual
    add (mulresunet.py:80-81,90-94) and the 2D variant lacks.

    ``phase=True`` executes the whole block in phase-blocked space
    (ops.phase_space — the TPU small-channel fast path): the first conv and
    the shortcut enter from plain or phase input (``phase_in``), everything
    after stays phase-resident (channel-major concat commutes with the
    layout), and the output is a phase tensor. Same params, same math.
    """
    u: int
    ndim: int
    alpha: float = 1.67
    act: str = "LeakyReLU"
    use_bias: bool = True
    drop: float = 0.0
    extra_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    phase: bool = False
    phase_in: bool = False
    phase_depth: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.alpha * self.u
        c1, c2, c3 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
        kw = dict(ndim=self.ndim, act=self.act, use_bias=self.use_bias,
                  dtype=self.dtype)
        np_ = 2 ** (self.ndim * self.phase_depth) if self.phase else 1
        pin = dict(phase_in=self.phase_in, phase_out=self.phase,
                   phase_depth=self.phase_depth) if self.phase else {}
        pmid = dict(phase_in=True, phase_out=True,
                    phase_depth=self.phase_depth) if self.phase else {}
        out1 = ConvNormAct(c1, 3, **kw, **pin)(x)
        out2 = ConvNormAct(c2, 3, **kw, **pmid)(out1)
        out3 = ConvNormAct(c3, 3, **kw, **pmid)(out2)
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.extra_norm:
            out = Norm(phase=np_)(out)
        out = Dropout(self.drop)(out)
        shortcut = ConvNormAct(c1 + c2 + c3, 1, **kw, **pin)(x)
        out = shortcut + out
        out = get_activation(self.act)(out)
        if self.extra_norm:
            out = Norm(phase=np_)(out)
        return Dropout(self.drop)(out)


class ResPath(nn.Module):
    """Residual skip path: 3x3 + 1x1 convs added (ResPath2d/ResPath3d).

    The 2D reference applies Norm(Dropout(act(.))) and the 3D one
    Dropout(Norm(act(.))) — ``norm_last`` selects the 2D ordering.
    """
    f_out: int
    ndim: int
    act: str = "LeakyReLU"
    use_bias: bool = True
    drop: float = 0.0
    norm_last: bool = True
    length: int = 1
    dtype: Optional[jnp.dtype] = None
    phase: bool = False  # phase-resident execution (input must be phase)
    phase_depth: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(ndim=self.ndim, act=self.act, use_bias=self.use_bias,
                  dtype=self.dtype)
        pp = dict(phase_in=True, phase_out=True,
                  phase_depth=self.phase_depth) if self.phase else {}
        np_ = 2 ** (self.ndim * self.phase_depth) if self.phase else 1
        for _ in range(self.length):
            a = ConvNormAct(self.f_out, 3, **kw, **pp)(x)
            b = ConvNormAct(self.f_out, 1, **kw, **pp)(x)
            y = get_activation(self.act)(a + b)
            if self.norm_last:
                x = Norm(phase=np_)(Dropout(self.drop)(y))
            else:
                x = Dropout(self.drop)(Norm(phase=np_)(y))
        return x


class MulResUnet(nn.Module):
    """Rank-polymorphic MultiRes U-Net (2D when ndim=2, 3D when ndim=3).

    ``dtype=bfloat16`` runs every conv in bf16 on the MXU (params and norm
    statistics stay f32; the output is cast back to the input dtype).
    ``remat`` wraps every multi-res block in ``jax.checkpoint`` so the
    backward pass recomputes block internals instead of storing them —
    essential for the (256,128,128) flagship patch, whose f32 activations
    otherwise exceed HBM and push XLA into a pathological auto-remat search.
    """
    out_channels: int = 1
    ndim: int = 2
    filters: Sequence[int] = (16, 32, 64, 128, 256)
    skip: Sequence[int] = (16, 32, 64, 128)
    alpha: float = 1.67
    act: str = "LeakyReLU"
    last_act: Optional[str] = None
    use_bias: bool = True
    upsample_mode: str = "nearest"
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    remat_levels: Optional[int] = None  # None -> all levels; N -> largest N
    # phase-space (space-to-depth) execution of the small-channel resolutions
    # (ops.phase_space): exact same math/params, ~8x MXU lane utilisation on
    # the C in {4..25} layers that dominate the flagship 3D step. N ->
    # resolutions 0..N-1 run phase-resident; None -> all.
    phase_space: bool = False
    phase_levels: Optional[int] = 3
    # resolutions 0..phase_deep_levels-1 (of the phased ones) run at phase
    # DEPTH 2 (channels x 4^ndim at 1/4 resolution) — the level-0 lane-
    # starvation lever (r3 profile: C_out*8 in {32,64,104} lanes caps the
    # forward/wgrad conv emitters at 25-81% of the MXU N dim). Exact same
    # math (the swap-fold composes); boundaries pay one s2d/d2s relayout.
    phase_deep_levels: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.phase_space import (depth_to_space, space_to_depth,
                                       upsample_into_phase)

        assert len(self.filters) == len(self.skip) + 1, \
            "filters must be one longer than skip (mulresunet.py:127)"
        n = len(self.filters)
        is3d = self.ndim == 3
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def phased(res: int) -> bool:
            """Does resolution level ``res`` run phase-resident?"""
            return self.phase_space and (self.phase_levels is None
                                         or res < self.phase_levels)

        def pdepth(res: int) -> int:
            """Phase blocking depth of resolution ``res`` (0 = plain)."""
            if not phased(res):
                return 0
            return 2 if res < self.phase_deep_levels else 1

        if self.phase_space:
            for r in range(n):
                if phased(r):
                    assert all(dim % 2 ** (r + pdepth(r)) == 0
                               for dim in x.shape[1:-1]), \
                        (f"phase level {r} needs spatial dims divisible by "
                         f"{2 ** (r + pdepth(r))}, got {x.shape[1:-1]} — "
                         "raise pad_multiple or lower phase_levels")

        def blocks_for(level_idx: int):
            """Checkpointed blocks on the largest (most memory-hungry)
            scales only; deeper scales are cheap to store."""
            use = self.remat and (self.remat_levels is None
                                  or level_idx < self.remat_levels)
            if use:
                return nn.remat(MultiResBlock), nn.remat(ResPath)
            return MultiResBlock, ResPath

        bkw = dict(ndim=self.ndim, alpha=self.alpha, act=self.act,
                   use_bias=self.use_bias, drop=self.dropout, extra_norm=is3d,
                   dtype=self.dtype)
        up_mode = "nearest" if self.upsample_mode == "nearest" else "linear"

        def level(i: int, h: jnp.ndarray) -> jnp.ndarray:
            """Resolution i-1 in, resolution i-1 out; ``h`` (and the return
            value) are phase tensors iff ``phased(i-1)``."""
            ph = phased(i - 1)     # layout at this level's own resolution
            dp = max(pdepth(i - 1), 1)
            enc_ph = phased(i)     # layout one resolution down
            enc_dp = max(pdepth(i), 1)
            Block, Path = blocks_for(i)
            b = 2 ** (self.ndim * dp)
            # skip branch (mulresunet 2D :155-158 / 3D :230-233)
            s = None
            if self.skip[i - 1] != 0:
                s = Path(self.skip[i - 1], self.ndim, act=self.act,
                         use_bias=self.use_bias, drop=self.dropout,
                         norm_last=not is3d, dtype=self.dtype, phase=ph,
                         phase_depth=dp)(h)
            # stride-2 downsampling (2D :150-153 has no Norm; 3D :224-227
            # does); with a phase input this is the natural stride-2 exit
            cin = h.shape[-1] // (b if ph else 1)
            d = Conv(cin, 3, stride=2, ndim=self.ndim,
                     use_bias=self.use_bias, dtype=self.dtype,
                     phase_in=ph, phase_depth=dp)(h)
            if is3d:
                d = Norm()(d)
            d = get_activation(self.act)(d)
            d = Dropout(self.dropout)(d)
            d = Block(self.filters[i], **bkw, phase=enc_ph,
                      phase_depth=enc_dp)(d)  # encoder
            if i < n - 1:
                d = level(i + 1, d)
            if enc_ph:
                # phase res-i -> plain res-i (small: half-res array)
                for _ in range(enc_dp):
                    d = depth_to_space(d)
            if ph:
                # x2 upsample landing directly in phase layout: the output's
                # phase grid IS d's array grid — channel repeat / 2-tap
                # stencil, no transposes; extra depth folds via s2d
                d = upsample_into_phase(d, up_mode)
                for _ in range(dp - 1):
                    d = space_to_depth(d)
            else:
                d = upsample(d, 2, self.upsample_mode)
            y = concat_crop([s, d]) if s is not None else d
            return Block(self.filters[i - 1], **bkw, phase=ph,
                         phase_in=ph, phase_depth=dp)(y)  # decoder block

        Block0, _ = blocks_for(0)
        dp0 = max(pdepth(0), 1)
        x = Block0(self.filters[0], **bkw, phase=phased(0),
                   phase_depth=dp0)(x)
        x = level(1, x)
        # output head: 1x1 conv in 2D (:178), 3x3 in 3D (:252)
        x = Conv(self.out_channels, 1 if self.ndim == 2 else 3,
                 ndim=self.ndim, use_bias=self.use_bias, dtype=self.dtype,
                 phase_in=phased(0), phase_out=phased(0),
                 phase_depth=dp0)(x)
        if phased(0):
            for _ in range(dp0):
                x = depth_to_space(x)  # tiny: out_channels lanes
        last = None if (isinstance(self.last_act, str)
                        and self.last_act.lower() == "none") else self.last_act
        if last is not None:
            x = get_activation(last)(x)
        return x.astype(in_dtype)
