"""Exact mid-optimisation checkpoint/resume — a capability beyond the
reference (which restarts Adam from saved weights, SURVEY §5)."""
import os

import numpy as np

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.engine import DIPSolver


def _problem(rng, nt=24, nx=16):
    t = np.linspace(0, 1, nt)[:, None]
    x = np.linspace(0, 1, nx)[None, :]
    img = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)[..., None]
    mask = np.repeat((rng.rand(1, nx) > 0.5).astype(np.float32), nt, 0)[..., None]
    return img, mask


def test_resume_is_exact(tmp_path, rng):
    img, mask = _problem(rng)
    cfg = Config(datadim="2d", epochs=30, inputdepth=4, filters=[8, 16],
                 skip=[4], scan_chunk=10, gain=1.0)
    ckpt = str(tmp_path / "state.npz")

    # uninterrupted run
    full = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)

    # run that checkpoints every chunk, interrupted after chunk 2 (20 iters)
    cfg_int = Config(**{**cfg.to_dict(), "epochs": 20})
    partial_run = DIPSolver(cfg_int, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt, checkpoint_every=1)
    assert os.path.exists(ckpt)
    assert partial_run.iters_run == 20

    # resume with the full epoch budget from the same checkpoint
    resumed = DIPSolver(cfg, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt)
    assert resumed.iters_run == 30
    assert len(resumed.history.loss) == 30

    # the resumed trajectory must match the uninterrupted one exactly:
    # same params, same Adam state, same RNG key were restored
    np.testing.assert_allclose(resumed.history.loss[:20],
                               full.history.loss[:20], rtol=1e-6)
    np.testing.assert_allclose(resumed.history.loss[20:],
                               full.history.loss[20:], rtol=1e-4)
    np.testing.assert_allclose(resumed.out_best, full.out_best,
                               rtol=1e-3, atol=1e-4)


def test_checkpoint_path_without_npz_suffix(tmp_path, rng):
    """np.savez appends '.npz' silently; a suffix-less path must still
    checkpoint and resume instead of crashing at the first write."""
    img, mask = _problem(rng)
    cfg = Config(datadim="2d", epochs=20, inputdepth=4, filters=[8, 16],
                 skip=[4], scan_chunk=10, gain=1.0)
    ckpt = str(tmp_path / "state.ckpt")  # no .npz
    run = DIPSolver(cfg, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt, checkpoint_every=1)
    assert run.iters_run == 20
    assert os.path.exists(ckpt + ".npz")
    # resume through the same suffix-less path
    cfg2 = Config(**{**cfg.to_dict(), "epochs": 30})
    resumed = DIPSolver(cfg2, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt)
    assert resumed.iters_run == 30


def test_resume_after_early_stop_is_final(tmp_path, rng):
    """A run checkpointed after early-stop must NOT execute extra steps on
    resume, even with a larger epoch budget: the stop decision is final."""
    img, mask = _problem(rng)
    cfg = Config(datadim="2d", epochs=40, inputdepth=4, filters=[8, 16],
                 skip=[4], scan_chunk=5, gain=1.0,
                 earlystop_patience=3, earlystop_min_delta=50.0)
    ckpt = str(tmp_path / "es.npz")
    run = DIPSolver(cfg, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt, checkpoint_every=1)
    assert run.stopped_early and run.iters_run < 40

    cfg_big = Config(**{**cfg.to_dict(), "epochs": 80})
    resumed = DIPSolver(cfg_big, outchannel=1).solve(
        img, mask, seed=0, checkpoint_path=ckpt)
    assert resumed.iters_run == run.iters_run  # no extra Adam steps
    assert resumed.stopped_early
    np.testing.assert_array_equal(resumed.out_best, run.out_best)
