"""Patch-parallel execution over device meshes."""
from .mesh import (make_mesh, overlap_add_sharded, setup_patch_batch,
                   solve_patches_batched)

__all__ = ["make_mesh", "overlap_add_sharded", "setup_patch_batch",
           "solve_patches_batched"]
