"""Model zoo and factory.

``get_net(cfg, outchannel)`` mirrors the reference factory semantics
(/root/reference/architectures/__init__.py:10-86) minus its latent defects:
the 2D 'unet' branch resolves to a working U-Net (the reference calls the
undefined ``UNetMod``, architectures/__init__.py:13) and 'skip' is reachable
in both 2D and 3D.
"""
from __future__ import annotations

from ..config import Config
from .blocks import (Conv, ConvNormAct, Dropout, Norm, concat_crop,
                     get_activation, lanczos_downsample, resample_kernel_1d,
                     symmetry, upsample)
from .init import init_weights
from .mulresunet import MulResUnet, MultiResBlock, ResPath, multires_width
from .skip import SkipNet
from .attention import (AttMulResUnet, AttentionUnet, CBAM, ChannelGate,
                        GridAttentionBlock, SpatialGate)
from .partial import PartialBlock, PartialConv, PartialUNet
from .unet import InstanceNorm, UNet
from .convgru import ConvGRUCell, Decoder, Encoder, Ensemble

__all__ = [
    "get_net", "init_weights", "MulResUnet", "MultiResBlock", "ResPath",
    "multires_width", "Conv", "ConvNormAct", "Norm", "Dropout",
    "concat_crop", "get_activation", "upsample", "lanczos_downsample",
    "SkipNet", "AttMulResUnet", "AttentionUnet", "CBAM", "ChannelGate",
    "GridAttentionBlock", "SpatialGate", "PartialBlock", "PartialConv",
    "PartialUNet", "InstanceNorm", "UNet", "ConvGRUCell", "Decoder",
    "Encoder", "Ensemble", "resample_kernel_1d", "symmetry",
]


def get_net(cfg: Config, outchannel: int = 1):
    """Map (datadim, net) -> a flax module (architectures/__init__.py:10-86)."""
    import jax.numpy as jnp

    ndim = cfg.ndim_model
    name = cfg.net
    common = dict(out_channels=outchannel, ndim=ndim,
                  act=cfg.activation, last_act=cfg.last_activation,
                  use_bias=True, upsample_mode=cfg.upsample,
                  dropout=cfg.dropout)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None

    if name in ("multiunet", "load"):
        return MulResUnet(filters=tuple(cfg.filters), skip=tuple(cfg.skip),
                          dtype=dtype, remat=cfg.remat,
                          remat_levels=cfg.remat_levels or None,
                          phase_space=cfg.phase_space and cfg.phase_levels != 0,
                          phase_levels=(None if cfg.phase_levels < 0
                                        else cfg.phase_levels),
                          phase_deep_levels=cfg.phase_deep_levels, **common)
    if name == "skip":
        from .skip import SkipNet
        return SkipNet(filters=tuple(cfg.filters), skip=tuple(cfg.skip), **common)
    if name == "attmultiunet":
        if ndim != 2:
            raise ValueError("attmultiunet is 2D-only (architectures/attention.py:197)")
        from .attention import AttMulResUnet
        return AttMulResUnet(filters=tuple(cfg.filters), **common)
    if name == "part":
        from .partial import PartialUNet
        common.pop("upsample_mode")
        common.pop("last_act")
        return PartialUNet(**common)
    if name == "unet":
        from .unet import UNet
        return UNet(filters=tuple(cfg.filters), **common)
    raise ValueError(f"unknown net '{name}'")
