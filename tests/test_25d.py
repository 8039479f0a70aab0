"""2.5D mode end-to-end: slices of a cube stacked as channels
(data.py:20-41, README.md:71-73 of the reference)."""
import numpy as np

from deep_prior_interpolation_tpu.cli import run
from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.data import (extract_patches,
                                               reconstruct_patches)
from deep_prior_interpolation_tpu.engine import DIPSolver


def test_25d_solver_multichannel(rng):
    """A 2.5D patch has imgchannel channels; the solver must fit all of
    them with a single 2D net (outchannel > 1)."""
    vol = rng.randn(24, 16, 3).astype(np.float32)  # (t, x, y=3 slices)
    mask3 = np.repeat((rng.rand(1, 16, 3) > 0.4).astype(np.float32), 24, 0)
    cfg = Config(datadim="2.5d", slice="tx", imgchannel=3, gain=1.0,
                 epochs=8, inputdepth=4, filters=[8, 16], skip=[4],
                 scan_chunk=4)
    patches = extract_patches(cfg, original=vol, corrupted=mask3)
    assert patches[0]["image"].shape == (24, 16, 3)  # y as channels
    solver = DIPSolver(cfg, outchannel=3)
    res = solver.solve(patches[0]["image"], patches[0]["mask"], seed=0)
    assert res.out_best.shape == (24, 16, 3)
    assert np.isfinite(res.history.loss[-1])


def test_25d_cli_roundtrip(tmp_path, rng):
    vol = rng.randn(16, 12, 4).astype(np.float32)
    mask = np.ones_like(vol)
    mask[:, ::3, :] = 0
    cfg = Config(imgdir=str(tmp_path), outdir="c25", datadim="2.5d",
                 slice="tx", imgchannel=2, gain=1.0, epochs=4, inputdepth=4,
                 filters=[8, 16], skip=[4], scan_chunk=2,
                 patch_shape=[-1, -1, 2], patch_stride=[-1, -1, 2])
    outpath = run(cfg, results_root=str(tmp_path / "results"),
                  original=vol, corrupted=mask)
    rec = reconstruct_patches(cfg, results_dir=outpath, original=vol)
    assert rec.shape == vol.shape
