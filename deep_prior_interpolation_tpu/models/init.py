"""Weight initialisation registry.

Capability parity with the reference ``init_weights``
(/root/reference/utils/torch.py:23-58): normal / xavier / kaiming /
orthogonal / default conv-kernel init, zero biases, and the reference's
distinctive Norm-scale init N(10.0, 10*gain) (utils/torch.py:52) which shapes
the DIP optimisation dynamics and is therefore reproduced by default.

Implemented as a pure pytree transform over flax params under an explicit
PRNG key (the torch version mutates modules in place under a global seed).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _fans(shape) -> tuple[int, int]:
    """(fan_in, fan_out) for a flax conv kernel (*window, in, out)."""
    receptive = math.prod(shape[:-2]) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def _init_kernel(key, shape, dtype, inittype: str, gain: float) -> jnp.ndarray:
    fan_in, fan_out = _fans(shape)
    if inittype == "normal":
        return gain * jax.random.normal(key, shape, dtype)
    if inittype == "xavier":
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    if inittype == "kaiming":
        # torch kaiming_normal_(a=0.2, mode='fan_in', leaky_relu)
        std = math.sqrt(2.0 / (1.0 + 0.2 ** 2)) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)
    if inittype == "orthogonal":
        return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
            key, shape, dtype)
    raise NotImplementedError(f"initialization method [{inittype}] is not implemented")


def init_weights(params: Any, key: jax.Array, inittype: str = "xavier",
                 gain: float = 0.02) -> Any:
    """Re-draw a flax ``params`` pytree with the chosen scheme.

    * conv kernels (leaves named 'kernel', rank >= 3) -> ``inittype``
    * conv biases -> 0
    * Norm 'scale' -> N(10, 10*gain)   [reference quirk, utils/torch.py:52]
    * Norm 'bias' -> 0
    """
    if inittype == "default":
        return params

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(flat))
    leaves = []
    for (path, leaf), k in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 3:
            leaves.append(_init_kernel(k, leaf.shape, leaf.dtype, inittype, gain))
        elif name == "scale":
            leaves.append(10.0 + 10.0 * gain * jax.random.normal(k, leaf.shape, leaf.dtype))
        elif name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
