"""Model / solver-state checkpointing.

Capability parity with the reference's two mechanisms (SURVEY §5): per-patch
model weights (torch.save(state_dict), main.py:238-240) reloaded through a
config-compatibility gate (main.py:105-110, parameter.py:133-173) — plus a
capability the reference lacks: full solver-state checkpointing
({params, opt_state, rng, best}) for exact mid-optimisation resume.

Format: flax msgpack for param pytrees (``.msgpack``), npz for full solver
state.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..config import Config, net_args_are_same, read_args


def save_params(path: str, params: Any) -> None:
    """Serialise a flax params pytree (parity: torch.save(state_dict))."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template: Any) -> Any:
    """Deserialise into the structure of ``template``."""
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())


def npz_path(path: str) -> str:
    """np.savez silently appends '.npz' when missing — normalise up front so
    save/exists/load all agree on one filename."""
    return path if path.endswith(".npz") else path + ".npz"


def load_checked(netpath: str, cfg: Config, template: Any,
                 results_root: str = "./results") -> Any:
    """Load weights after enforcing config compatibility
    (parity: main.py:105-110 — read the saved run's args.txt, check
    ``net_args_are_same``, then load).

    ``netpath`` may be absolute (the reference accepts absolute --netdir,
    main.py:105-110) or relative to ``results_root``.
    """
    full = netpath if os.path.isabs(netpath) \
        else os.path.join(results_root, netpath)
    args_path = os.path.join(os.path.dirname(full), "args.txt")
    saved_cfg = read_args(args_path)
    assert net_args_are_same(cfg, saved_cfg), \
        "saved network config is incompatible with the current one"
    return load_params(full, template)


def save_solver_state(path: str, carry: dict) -> None:
    """Full solver-state checkpoint: params, Adam moments, RNG, trackers."""
    path = npz_path(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(carry))
    arrays = {}
    for p, leaf in flat:
        arrays[jax.tree_util.keystr(p)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_solver_state(path: str, template: dict) -> dict:
    """Restore a solver carry saved by :func:`save_solver_state`."""
    with np.load(npz_path(path), allow_pickle=False) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            arr = z[jax.tree_util.keystr(p)]
            leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
