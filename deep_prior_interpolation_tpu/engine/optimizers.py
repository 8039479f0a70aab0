"""Bayesian (Langevin) optimizers as optax gradient transformations.

Capability parity with /root/reference/architectures/optimizers.py: SGLD —
SGD(+momentum/nesterov/weight-decay) with isotropic Gaussian injection at
fixed scale sqrt(noise_scale) (optimizers.py:10-107, noise at :106) — and
pSGLD — RMSprop-preconditioned Langevin dynamics with noise std
sqrt(2*lr/G) (optimizers.py:110-183, noise at :178-181).

Implemented the optax way: pure ``GradientTransformation``s whose state
carries the PRNG key, so they compose with the scanned solver and with any
optax chain. (The torch versions mutate parameters under the global seed.)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SGLDState(NamedTuple):
    key: jax.Array
    momentum: Optional[optax.Updates]
    step: jax.Array


def sgld(lr: float, noise_scale: float = 0.1, momentum: float = 0.0,
         dampening: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, seed: int = 0) -> optax.GradientTransformation:
    """Stochastic gradient Langevin dynamics (optimizers.py:10-107).

    update = -lr * d_p + sqrt(noise_scale) * N(0, 1)
    with torch-SGD momentum semantics (buf = m*buf + (1-dampening)*g).
    """
    if lr < 0.0:
        raise ValueError(f"Invalid learning rate: {lr}")
    if momentum < 0.0:
        raise ValueError(f"Invalid momentum value: {momentum}")
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("Nesterov momentum requires a momentum and zero dampening")

    def init(params):
        mom = jax.tree_util.tree_map(jnp.zeros_like, params) if momentum else None
        return SGLDState(key=jax.random.PRNGKey(seed), momentum=mom,
                         step=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        if weight_decay and params is not None:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        mom = state.momentum
        if momentum:
            # torch SGD first-step semantics (reference optimizers.py:94-97):
            # the buffer is initialised to d_p itself — dampening only
            # applies from the second step on
            first = state.step == 0
            mom = jax.tree_util.tree_map(
                lambda b, g: jnp.where(first, g,
                                       momentum * b + (1 - dampening) * g),
                mom, grads)
            d_p = jax.tree_util.tree_map(
                lambda g, b: g + momentum * b, grads, mom) if nesterov else mom
        else:
            d_p = grads
        leaves, treedef = jax.tree_util.tree_flatten(d_p)
        key, *keys = jax.random.split(state.key, len(leaves) + 1)
        noisy = [
            -lr * d + jnp.sqrt(noise_scale) * jax.random.normal(k, d.shape, d.dtype)
            for d, k in zip(leaves, keys)]
        return (jax.tree_util.tree_unflatten(treedef, noisy),
                SGLDState(key=key, momentum=mom, step=state.step + 1))

    return optax.GradientTransformation(init, update)


class PSGLDState(NamedTuple):
    key: jax.Array
    v: optax.Updates
    grad_avg: Optional[optax.Updates]


def psgld(lr: float = 1e-2, beta: float = 0.99, Lambda: float = 1e-8,
          weight_decay: float = 0.0, centered: bool = False,
          seed: int = 0) -> optax.GradientTransformation:
    """Preconditioned SGLD on RMSprop (optimizers.py:110-183).

    V <- beta*V + (1-beta)*g^2 ; G = sqrt(V) + Lambda
    update = -lr * g / G + N(0, 2*lr/G)
    """
    for name, v in [("learning rate", lr), ("epsilon", Lambda),
                    ("weight_decay", weight_decay), ("beta", beta)]:
        if v < 0.0:
            raise ValueError(f"Invalid {name} value: {v}")

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return PSGLDState(key=jax.random.PRNGKey(seed), v=zeros,
                          grad_avg=zeros if centered else None)

    def update(grads, state, params=None):
        if weight_decay and params is not None:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        v = jax.tree_util.tree_map(
            lambda V, g: beta * V + (1 - beta) * g * g, state.v, grads)
        if centered:
            ga = jax.tree_util.tree_map(
                lambda a, g: beta * a + (1 - beta) * g, state.grad_avg, grads)
            G = jax.tree_util.tree_map(
                lambda V, a: jnp.sqrt(V - a * a) + Lambda, v, ga)
        else:
            ga = None
            G = jax.tree_util.tree_map(
                lambda V: jnp.sqrt(V) + Lambda, v)
        leaves_g, treedef = jax.tree_util.tree_flatten(grads)
        leaves_G = treedef.flatten_up_to(G)
        key, *keys = jax.random.split(state.key, len(leaves_g) + 1)
        upd = [
            -lr * g / Gl + jnp.sqrt(2 * lr / Gl)
            * jax.random.normal(k, g.shape, g.dtype)
            for g, Gl, k in zip(leaves_g, leaves_G, keys)]
        return (jax.tree_util.tree_unflatten(treedef, upd),
                PSGLDState(key=key, v=v, grad_avg=ga))

    return optax.GradientTransformation(init, update)
