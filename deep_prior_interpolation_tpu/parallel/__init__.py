"""Patch-parallel execution over device meshes."""
from .mesh import make_mesh, overlap_add_sharded, solve_patches_batched

__all__ = ["make_mesh", "overlap_add_sharded", "solve_patches_batched"]
