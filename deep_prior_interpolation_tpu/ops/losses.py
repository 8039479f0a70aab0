"""Losses and reconstruction metrics as pure jax.numpy functions.

Capability parity with the reference's masked data-fit (main.py:161: mean
L1/L2 over ``out*mask`` vs ``img*mask``, mean taken over *all* elements, not
only observed ones) and ``utils/metrics.py:6-44`` (SNR in dB, Pearson
correlation). Everything here is shape-polymorphic, jit/vmap-safe, and
dtype-preserving so it can live inside the scanned DIP step.
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_mae(out: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |out*mask - target*mask| over all elements (main.py:161, L1Loss)."""
    return jnp.mean(jnp.abs((out - target) * mask))


def masked_mse(out: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean ((out-target)*mask)^2 over all elements (main.py:161, MSELoss)."""
    d = (out - target) * mask
    return jnp.mean(d * d)


def mae(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(out - target))


def mse(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = out - target
    return jnp.mean(d * d)


def get_loss_fn(name: str):
    """'mae' -> L1, 'mse' -> L2 (parity: main.py:24-27)."""
    if name == "mse":
        return masked_mse
    if name in ("mae", "l1"):
        return masked_mae
    raise ValueError(f"unknown loss '{name}'")


def snr(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio in dB (parity: utils/metrics.py:6-17)."""
    num = jnp.sum(target * target)
    den = jnp.sum((target - output) ** 2)
    return 10.0 * jnp.log10(num / den)


def pcorr(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation coefficient (parity: utils/metrics.py:20-44)."""
    t = target - jnp.mean(target)
    o = output - jnp.mean(output)
    return jnp.sum(t * o) / (jnp.sqrt(jnp.sum(t * t)) * jnp.sqrt(jnp.sum(o * o)))
