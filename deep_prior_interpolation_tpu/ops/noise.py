"""Noise tensors under explicit jax.random keys.

Capability parity with the reference's global-seed torch streams
(utils/torch.py:61-106 ``get_noise``/``build_noise_tensor``): uniform /
normal / Cauchy input tensors, per-iteration regularisation noise, and the
data-forgetting input schedule (main.py:86-97). Statistics match the
reference; bit-level streams intentionally do not (acceptance is SNR-based).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_noise(key: jax.Array, shape: Sequence[int], noise_dist: str = "n",
              dtype=jnp.float32) -> jnp.ndarray:
    """Noise tensor of ``shape``; dist in {'n','u','c'} (utils/torch.py:61-73).

    'u' is U[0,1) (torch ``uniform_()`` default), 'n' is N(0,1), 'c' is a
    standard Cauchy (sampled via tan of a uniform angle, matching torch
    ``cauchy_()`` with median 0, sigma 1).
    """
    if noise_dist == "n":
        return jax.random.normal(key, tuple(shape), dtype)
    if noise_dist == "u":
        return jax.random.uniform(key, tuple(shape), dtype)
    if noise_dist == "c":
        return jax.random.cauchy(key, tuple(shape), dtype)
    raise ValueError("noise_dist has to be one of [u, n, c]")


def data_forgetting_weights(factor: int) -> np.ndarray:
    """Log-spaced 1 -> 1e-4 ramp over ``factor`` iters (main.py:97)."""
    if factor <= 0:
        return np.zeros((0,), np.float32)
    return np.logspace(0, -4, factor).astype(np.float32)


def build_forgetting_data(img_masked: jnp.ndarray, inputdepth: int) -> jnp.ndarray:
    """Decimated data tiled along channels to the input depth (main.py:86-96).

    ``img_masked`` is channels-last (*spatial, C); the result is
    (*spatial, inputdepth), std-normalised by the caller.
    """
    c = img_masked.shape[-1]
    reps = -(-inputdepth // c)  # ceil
    tiled = jnp.tile(img_masked, (1,) * (img_masked.ndim - 1) + (reps,))
    return tiled[..., :inputdepth]
