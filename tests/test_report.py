"""Post-run report and plotting helpers."""
import os

import numpy as np

from deep_prior_interpolation_tpu.utils.plotting import (clim, explode_volume,
                                                         gif_from_array,
                                                         plot_gather)


def test_clim_symmetric(rng):
    x = rng.randn(50, 50)
    lo, hi = clim(x, 95)
    assert lo == -hi and hi > 0


def test_plot_gather_and_volume(tmp_path, rng):
    g = rng.randn(32, 16).astype(np.float32)
    fig = plot_gather(g, filename=str(tmp_path / "g.png"))
    assert os.path.exists(tmp_path / "g.png")
    vol = rng.randn(16, 12, 10).astype(np.float32)
    fig = explode_volume(vol, filename=str(tmp_path / "v"))
    assert os.path.exists(tmp_path / "v.png")


def test_gif_export(tmp_path, rng):
    vol = rng.randn(5, 16, 16).astype(np.float32)
    gif_from_array(vol, str(tmp_path / "a.gif"))
    assert os.path.exists(tmp_path / "a.gif")


def test_show_results_end_to_end(tmp_path, rng):
    """Full pipeline: cli.run -> show_results report (results.py:19-87)."""
    from deep_prior_interpolation_tpu.cli import run
    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.io import show_results

    vol = np.sin(np.linspace(0, 6, 32))[:, None] * np.ones((1, 16))
    vol = vol.astype(np.float32)
    mask = np.ones_like(vol)
    mask[:, ::2] = 0

    cfg = Config(imgdir=str(tmp_path), outdir="rep", datadim="2d",
                 epochs=8, inputdepth=4, filters=[8, 16], skip=[4],
                 scan_chunk=4, gain=2.0, seed=0)
    outpath = run(cfg, results_root=str(tmp_path / "results"),
                  original=vol, corrupted=mask)
    outputs, summary = show_results(outpath, curves=1, savefig=True,
                                    original=vol)
    assert outputs.shape == vol.shape
    assert "snr" in summary and summary["n_patches"] == 1
    assert os.path.exists(os.path.join(outpath, "curves.png"))


def test_seismograms_wiggle(rng):
    import matplotlib.pyplot as plt
    from deep_prior_interpolation_tpu.utils.plotting import seismograms
    fig, ax = plt.subplots()
    seismograms(rng.randn(64, 8).astype(np.float32), ax, gain=0.5)
    assert len(ax.collections) > 0  # fill_betweenx drew the wiggles
    plt.close(fig)
