"""Run-bundle content parity with the reference result protocol.

The reference saves {device, elapsed, outpath, history, mask, image, output,
noise} per patch (main.py:226-235) and additionally 'pocs' under the POCS
driver (main_pocs.py:260-270). These tests pin our ``*_run.npz`` bundles to
that field set, including in the batched (vmap) path, and pin snapshot files
for both paths.
"""
import os

import numpy as np
import pytest

from deep_prior_interpolation_tpu.cli import run
from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.io.results import load_run

REFERENCE_FIELDS = {"device", "elapsed", "outpath", "history", "mask",
                    "image", "output", "noise"}


@pytest.fixture(scope="module")
def small_problem(request):
    rng = np.random.RandomState(3)
    img = np.cumsum(rng.randn(32, 16, 1), axis=0).astype(np.float32)
    img /= np.abs(img).max()
    mask = np.ones_like(img)
    mask[:, 1::2] = 0.0
    return img, mask


def _tiny_cfg(**kw):
    base = dict(datadim="2d", epochs=6, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=3, seed=0)
    base.update(kw)
    return Config(**base)


def test_sequential_bundle_fields(tmp_path, small_problem):
    img, mask = small_problem
    cfg = _tiny_cfg(outdir="seq", save_every=3)
    out = run(cfg, results_root=str(tmp_path), original=img, corrupted=mask)
    bundle = load_run(os.path.join(out, "0_run.npz"))
    assert REFERENCE_FIELDS <= set(bundle)
    assert bundle["noise"].shape == img.shape[:-1] + (cfg.inputdepth,)
    assert np.all(np.isfinite(bundle["noise"]))
    assert bundle["output"].shape == img.shape
    # save_every snapshot protocol (main.py:184-189)
    snaps = [f for f in os.listdir(out) if "_output" in f]
    assert snaps, "expected intermediate output snapshots"


def test_pocs_bundle_adds_projection(tmp_path, small_problem):
    img, mask = small_problem
    cfg = _tiny_cfg(outdir="pocs", pocs=True)
    out = run(cfg, results_root=str(tmp_path), original=img, corrupted=mask)
    bundle = load_run(os.path.join(out, "0_run.npz"))
    assert (REFERENCE_FIELDS | {"pocs"}) <= set(bundle)
    assert bundle["pocs"].shape == img.shape
    assert np.all(np.isfinite(bundle["pocs"]))


def test_batched_bundles_and_snapshots(tmp_path, small_problem):
    img, mask = small_problem
    cfg = _tiny_cfg(outdir="bat", patch_shape=[16, 16], patch_stride=[16, 16],
                    batch_patches=2, save_every=3)
    out = run(cfg, results_root=str(tmp_path), original=img, corrupted=mask)
    bundles = sorted(f for f in os.listdir(out) if f.endswith("_run.npz"))
    assert len(bundles) == 2
    for f in bundles:
        bundle = load_run(os.path.join(out, f))
        assert REFERENCE_FIELDS <= set(bundle)
        assert bundle["noise"].shape == (16, 16, cfg.inputdepth)
    snaps = [f for f in os.listdir(out) if "_output" in f]
    assert len(snaps) == 2, "one save_every snapshot per patch"


def test_history_reg_trace_roundtrip():
    """HistoryReg (library surface for operator-regularised workflows) logs
    df/reg alongside the History fields (utils/metrics.py:88-137)."""
    from deep_prior_interpolation_tpu.engine.history import HistoryReg

    h = HistoryReg(epochs=4)
    h.extend({f: np.asarray([1.0, 0.5]) for f in h.FIELDS}, 2)
    assert len(h) == 2
    assert set(h.as_dict()) == {"loss", "df", "reg", "snr", "pcorr", "lr"}
    msg = h.log_message(1)
    assert "DF" in msg and "REG" in msg
