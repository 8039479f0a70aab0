"""Parallel execution over device meshes: across patches (mesh) and,
for volumes too large for one chip, within a single patch (spatial)."""
from .mesh import (make_mesh, overlap_add_sharded, setup_patch_batch,
                   solve_patches_batched)
from .spatial import make_spatial_mesh, shard_solver_state

__all__ = ["make_mesh", "overlap_add_sharded", "setup_patch_batch",
           "solve_patches_batched", "make_spatial_mesh",
           "shard_solver_state"]
