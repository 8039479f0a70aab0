"""Patch-parallel execution over device meshes."""
from .mesh import make_mesh, solve_patches_batched

__all__ = ["make_mesh", "solve_patches_batched"]
