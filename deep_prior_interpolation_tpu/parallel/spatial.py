"""Spatial sharding of a SINGLE oversized patch over a device mesh.

The tensor/model-parallel analog named by SURVEY §2.2 (TP row): "XLA SPMD
spatial sharding of the 3D conv input is the natural analog if a single
volume ever exceeds one core's HBM". The patch-parallel layer (mesh.py)
scales across *independent* patches; this module scales *within one patch*:
every activation-sized tensor — data volume, mask, input-noise canvas, the
best-output tracker — is sharded along one spatial axis over a 1-D
``Mesh("space")``, while the (small, ~1-10 M param) network and its Adam
state stay replicated.

No new step function and no manual collectives: sharding in JAX is data
PLACEMENT, not code. The solver's jitted chunk (engine/solver.py
``make_run_chunk``) is reused byte-identically; XLA GSPMD partitions the
compiled program from the input shardings, inserting

  * halo exchanges (``collective-permute``) around every same-pad conv's
    sharded spatial dim,
  * one all-reduce per Norm statistic (per-channel spatial mean/var,
    models/blocks.py), and
  * one all-reduce per weight gradient (the spatial shards act as data
    parallelism from the replicated parameters' point of view).

When to use (docs/NUMERICS.md, docs/PERF.md): f32/HIGHEST precision at
flagship scale — whose no-remat backward exceeds one v5e chip's HBM — or
solving an un-tiled volume directly instead of overlap-add patching
(the reference's only big-volume mechanism, utils/patch_extractor.py).

Numerics note: the inserted all-reduces change the summation ORDER of norm
statistics and weight gradients, so a sharded solve matches a single-device
solve to reduction-rounding (exact at step 0, ~1 ulp/step drift that chaotic
DIP configs amplify over thousands of iterations) — the same contract as the
batched-setup path (docs/PERF.md r5). Parity is pinned statistically in
tests/test_spatial.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"

# data-dict entries shaped (1, *spatial[, depth]) — everything that scales
# with the volume. Scalars/keys/taps (forget_w, input_key) stay replicated.
_SPATIAL_DATA_KEYS = frozenset({
    "img", "mask", "base_input", "forget_data", "net_mask",
    "pocs_wdata", "pocs_wmask",
})
# carry entries shaped (1, *spatial, C); params / Adam moments / scalar
# trackers are replicated (they are what the spatial shards synchronise on)
_SPATIAL_CARRY_KEYS = frozenset({"out_best", "out_last"})


def make_spatial_mesh(n_devices: int = 0,
                      devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D ``"space"`` mesh over the first ``n_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SPACE_AXIS,))


def _volume_spec(ndim: int, spatial_axis: int) -> P:
    """PartitionSpec for a (1, *spatial[, C]) tensor sharded on one
    spatial axis. ``spatial_axis`` indexes the SPATIAL dims (0 = time)."""
    dims: list = [None] * ndim
    dims[1 + spatial_axis] = SPACE_AXIS  # +1 for the leading batch dim
    return P(*dims)


def shard_solver_state(mesh: Mesh, spatial_axis: int,
                       data: Dict[str, Any], carry: Dict[str, Any],
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Place ``data``/``carry`` for a spatially-sharded solve.

    Volume-sized leaves get ``NamedSharding(mesh, (..., "space", ...))`` on
    the chosen spatial axis; every other leaf is replicated on the same
    mesh (committed, so eager ops and the jit both resolve to the mesh's
    backend — placement discipline as in mesh.py's patch path). Returns the
    placed ``(data, carry)``; shapes and values are untouched, and uneven
    shard sizes (axis not divisible by the mesh) are legal under GSPMD.
    """
    replicated = NamedSharding(mesh, P())

    def place(tree, spatial_keys):
        placed = {}
        for name, leaf in tree.items():
            if name in spatial_keys:
                sh = NamedSharding(mesh, _volume_spec(leaf.ndim, spatial_axis))
                placed[name] = jax.device_put(leaf, sh)
            else:
                placed[name] = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, replicated), leaf)
        return placed

    n = mesh.devices.size
    for name in _SPATIAL_DATA_KEYS & set(data):
        dim = data[name].shape[1 + spatial_axis]
        assert dim >= n, (
            f"data[{name!r}] spatial axis {spatial_axis} has extent {dim} "
            f"< mesh size {n}; pick a longer axis or a smaller mesh")
    return place(data, _SPATIAL_DATA_KEYS), place(carry, _SPATIAL_CARRY_KEYS)
