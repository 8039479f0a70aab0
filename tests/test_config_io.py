"""Config system, manifests, checkpoints, run bundles, CLI end-to-end."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import (Config, net_args_are_same,
                                                 parse_arguments, read_args,
                                                 write_args)
from deep_prior_interpolation_tpu.io import (load_params, load_run,
                                             load_solver_state, save_params,
                                             save_run, save_solver_state,
                                             completed_patches,
                                             create_run_folder)


def test_parse_arguments_derivations():
    cfg = parse_arguments(["--imgdir", "x", "--datadim", "3d",
                           "--upsample", "linear", "--epochs", "100"])
    assert cfg.upsample == "trilinear"
    assert cfg.patch_shape == [-1, -1, -1]
    assert cfg.patch_stride == cfg.patch_shape
    assert cfg.earlystop_patience == 100

    cfg2 = parse_arguments(["--imgdir", "x", "--upsample", "linear"])
    assert cfg2.upsample == "bilinear"
    assert cfg2.patch_shape == [-1, -1]


def test_args_roundtrip(tmp_path):
    cfg = Config(imgdir="d", epochs=123, filters=[8, 16], gain=5.0)
    p = str(tmp_path / "args.txt")
    write_args(p, cfg)
    cfg2 = read_args(p)
    assert cfg2.epochs == 123 and cfg2.filters == [8, 16] and cfg2.gain == 5.0


def test_net_args_are_same():
    a = Config(epochs=10)
    b = Config(epochs=20)  # epochs not checked
    assert net_args_are_same(a, b, verbose=False)
    c = Config(inputdepth=32)
    assert not net_args_are_same(a, c, verbose=False)
    d = Config(activation="ReLU")  # mild key -> warn but pass
    assert net_args_are_same(a, d, verbose=False)


def test_params_roundtrip(tmp_path):
    from deep_prior_interpolation_tpu.models import MulResUnet
    model = MulResUnet(out_channels=1, ndim=2, filters=(8, 16), skip=(4,))
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    path = str(tmp_path / "m.msgpack")
    save_params(path, params)
    params2 = load_params(path, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2)


def test_solver_state_roundtrip(tmp_path):
    carry = {"params": {"k": jnp.arange(4.0)}, "lr": jnp.float32(0.1),
             "step": jnp.int32(7)}
    path = str(tmp_path / "state.npz")
    save_solver_state(path, carry)
    carry2 = load_solver_state(path, carry)
    np.testing.assert_array_equal(np.asarray(carry2["params"]["k"]),
                                  np.arange(4.0))
    assert int(carry2["step"]) == 7


def test_run_bundle_roundtrip(tmp_path):
    from deep_prior_interpolation_tpu.engine.history import History
    h = History(5)
    for i in range(5):
        h.append((1.0 / (i + 1), float(i), 0.5, 1e-3))
    out = str(tmp_path / "run")
    save_run(out, "0001", h, np.ones((4, 4)), np.zeros((4, 4)),
             np.full((4, 4), 2.0), elapsed=12.5)
    assert completed_patches(out) == ["0001"]
    bundle = load_run(os.path.join(out, "0001_run.npz"))
    assert bundle["history"]["loss"][0] == 1.0
    np.testing.assert_array_equal(bundle["output"], np.full((4, 4), 2.0))
    assert bundle["elapsed_seconds"] == 12.5


def test_create_run_folder(tmp_path):
    a = create_run_folder(str(tmp_path), "exp")
    b = create_run_folder(str(tmp_path), "exp")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)


def test_cli_end_to_end(tmp_path, rng):
    """Full driver run on a tiny synthetic problem (parity: main.py:254-297)."""
    from deep_prior_interpolation_tpu.cli import run
    from deep_prior_interpolation_tpu.data import reconstruct_patches

    vol = np.sin(np.linspace(0, 6, 32))[:, None] * np.ones((1, 16))
    vol = vol.astype(np.float32)
    mask = np.ones_like(vol)
    mask[:, ::2] = 0

    cfg = Config(imgdir=str(tmp_path), outdir="testrun", datadim="2d",
                 epochs=12, inputdepth=4, filters=[8, 16], skip=[4],
                 scan_chunk=6, gain=1.0, savemodel=True, seed=0)
    outpath = run(cfg, results_root=str(tmp_path / "results"),
                  original=vol, corrupted=mask)
    assert os.path.exists(os.path.join(outpath, "args.txt"))
    assert os.path.exists(os.path.join(outpath, "0_run.npz"))
    assert os.path.exists(os.path.join(outpath, "0_model.msgpack"))
    rec = reconstruct_patches(cfg, results_dir=outpath, original=vol)
    assert rec.shape == vol.shape

    # resume: re-running skips the completed patch without error
    outpath2 = run(cfg, results_root=str(tmp_path / "results"),
                   original=vol, corrupted=mask)
    assert outpath2 == outpath


def test_load_checked_absolute_path(tmp_path):
    """--netdir with an absolute path (the reference accepts these,
    main.py:105-110) must resolve args.txt next to the weights file."""
    from deep_prior_interpolation_tpu.io import load_checked
    from deep_prior_interpolation_tpu.models import MulResUnet
    model = MulResUnet(out_channels=1, ndim=2, filters=(8, 16), skip=(4,))
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    cfg = Config(datadim="2d", inputdepth=4, filters=[8, 16], skip=[4])
    run_dir = tmp_path / "oldrun"
    run_dir.mkdir()
    save_params(str(run_dir / "0_model.msgpack"), params)
    write_args(str(run_dir / "args.txt"), cfg)
    loaded = load_checked(str(run_dir / "0_model.msgpack"), cfg, params,
                          results_root=str(tmp_path / "elsewhere"))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, loaded)
