"""Transfer-learning workflow end-to-end (BASELINE.json config #3; reference
README.md:60-65): run 1 saves weights with --savemodel, run 2 loads them with
--net load --netdir through the args.txt compatibility gate."""
import os

import numpy as np
import pytest

from deep_prior_interpolation_tpu.cli import run
from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.io import load_run


def _shots(rng, nt=32, nx=16):
    t = np.linspace(0, 1, nt)[:, None]
    x = np.linspace(0, 1, nx)[None, :]
    shot1 = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)
    # a neighbouring shot: same events, slightly scaled amplitudes
    shot2 = (0.9 * shot1).astype(np.float32)
    mask = np.repeat((rng.rand(1, nx) > 0.5).astype(np.float32), nt, 0)
    return shot1, shot2, mask


def test_transfer_shot1_to_shot2(tmp_path, rng):
    shot1, shot2, mask = _shots(rng)
    root = str(tmp_path / "results")
    base = dict(imgdir=str(tmp_path), datadim="2d", epochs=30, inputdepth=4,
                filters=[8, 16], skip=[4], scan_chunk=10, gain=1.0, seed=0)

    # run 1: optimise on shot1, save the model
    cfg1 = Config(**base, outdir="TL/shot1", savemodel=True)
    out1 = run(cfg1, results_root=root, original=shot1, corrupted=mask)
    model_rel = "TL/shot1/0_model.msgpack"
    assert os.path.exists(os.path.join(root, model_rel))

    # run 2: warm-start shot2 from shot1's weights (--net load --netdir)
    cfg2 = Config(**base, outdir="TL/shot2", net="load", netdir=[model_rel])
    out2 = run(cfg2, results_root=root, original=shot2, corrupted=mask)
    b2 = load_run(os.path.join(out2, "0_run.npz"))

    # cold-start control on shot2
    cfg3 = Config(**base, outdir="TL/shot2_cold")
    out3 = run(cfg3, results_root=root, original=shot2, corrupted=mask)
    b3 = load_run(os.path.join(out3, "0_run.npz"))

    # the warm start must begin at a much lower loss than the cold start
    assert b2["history"]["loss"][0] < 0.5 * b3["history"]["loss"][0]


def test_transfer_rejects_incompatible_config(tmp_path, rng):
    shot1, _, mask = _shots(rng)
    root = str(tmp_path / "results")
    cfg1 = Config(imgdir=str(tmp_path), outdir="TL/a", datadim="2d", epochs=6,
                  inputdepth=4, filters=[8, 16], skip=[4], scan_chunk=3,
                  gain=1.0, savemodel=True)
    run(cfg1, results_root=root, original=shot1, corrupted=mask)

    # inputdepth is a hard key (parameter.py:134-145) -> must be refused
    cfg2 = Config(imgdir=str(tmp_path), outdir="TL/b", datadim="2d", epochs=6,
                  inputdepth=8, filters=[8, 16], skip=[4], scan_chunk=3,
                  gain=1.0, net="load", netdir=["TL/a/0_model.msgpack"])
    with pytest.raises(AssertionError):
        run(cfg2, results_root=root, original=shot1, corrupted=mask)
