"""Field-scale workflow: tile a volume, solve patches over a device mesh,
re-assemble with overlap-add (BASELINE.json config #5).

A volume larger than one patch is tiled with overlap
(``--patch_shape/--patch_stride`` semantics, data.py:56-64 in the reference),
every patch runs its own DIP net — one patch per device over a 1-D
``Mesh(("patch",))`` — and the best outputs are averaged back together
(utils/patch_extractor.py:370-428 semantics, as one device scatter-add).

Usage:
  python examples/field_scale.py            # auto mesh over all devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/field_scale.py        # 8-way virtual mesh demo
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import deep_prior_interpolation_tpu as dpi
from deep_prior_interpolation_tpu.data import (decimated_pair, extract_patches,
                                               reconstruct_patches)
from deep_prior_interpolation_tpu.engine import DIPSolver
from deep_prior_interpolation_tpu.ops import snr
from deep_prior_interpolation_tpu.parallel import solve_patches_batched

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

# a 2D "field" gather: 256 x 128 with 50% of traces missing
vol, mask = decimated_pair(nt=256, nx=128, ny=None, rate=0.5, seed=3)

n_dev = jax.device_count()
cfg = dpi.Config(datadim="2d", gain=1.0, epochs=EPOCHS, loss="mae",
                 inputdepth=32, filters=[8, 16, 32], skip=[4, 8],
                 scan_chunk=50,
                 patch_shape=[128, 64], patch_stride=[64, 32],
                 batch_patches=n_dev, mesh_shape=n_dev if n_dev > 1 else 0)

patches = extract_patches(cfg, original=vol, corrupted=mask)
print(f"{len(patches)} overlapping patches of {patches[0]['image'].shape} "
      f"over {n_dev} device(s)")

solver = DIPSolver(cfg, outchannel=1)
outs = []
t0 = time.time()
for start in range(0, len(patches), max(1, cfg.batch_patches)):
    group = patches[start:start + max(1, cfg.batch_patches)]
    results = solve_patches_batched(cfg, solver, group)
    outs.extend(r.out_best for r in results)
    print(f"  solved patches {start}..{start + len(group) - 1}")
elapsed = time.time() - t0

recon = reconstruct_patches(cfg, patches_out=np.stack(outs), original=vol)
print(f"reconstruction SNR {float(snr(recon, vol)):.2f} dB "
      f"({len(patches)} patches, {EPOCHS} iters each, {elapsed:.0f}s)")
