"""Engine tests: the chunked-scan solver, LR plateau, early stopping,
best-output tracking, POCS term, transfer init."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.engine import DIPSolver
from deep_prior_interpolation_tpu.ops import snr


def tiny_cfg(**kw):
    base = dict(datadim="2d", epochs=40, inputdepth=4, filters=[8, 16],
                skip=[4], scan_chunk=10, reg_noise_std=0.03, gain=1.0)
    base.update(kw)
    return Config(**base)


def synth_problem(rng, nt=32, nx=24, drop=0.5):
    t = np.linspace(0, 1, nt)[:, None]
    x = np.linspace(0, 1, nx)[None, :]
    img = np.sin(2 * np.pi * (3 * t + 2 * x)).astype(np.float32)[..., None]
    m = (rng.rand(1, nx) > drop).astype(np.float32)
    mask = np.repeat(m, nt, 0)[..., None]
    return img, mask


def test_solver_reduces_loss_and_reconstructs(rng):
    img, mask = synth_problem(rng)
    solver = DIPSolver(tiny_cfg(epochs=80), outchannel=1)
    res = solver.solve(img, mask, seed=0)
    assert res.iters_run == 80
    assert res.history.loss[-1] < 0.3 * res.history.loss[0]
    assert res.out_best.shape == img.shape
    assert len(res.history.loss) == 80
    # history tracks monotone best: out_best corresponds to min loss iterate
    assert min(res.history.loss) <= res.history.loss[-1] + 1e-9


def test_early_stopping_triggers(rng):
    img, mask = synth_problem(rng)
    # patience 3 with a 50% min-delta is basically unmeetable -> stops early
    cfg = tiny_cfg(epochs=40, earlystop_patience=3, earlystop_min_delta=50.0)
    solver = DIPSolver(cfg, outchannel=1)
    res = solver.solve(img, mask, seed=0)
    assert res.stopped_early
    assert res.iters_run < 40


def test_reduce_lr_plateau(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=30, reduce_lr=True, lr_patience=2, lr_factor=0.5,
                   lr_thresh=0.9)  # near-impossible rel improvement -> reduce
    solver = DIPSolver(cfg, outchannel=1)
    res = solver.solve(img, mask, seed=0)
    lrs = np.asarray(res.history.lr)
    assert lrs[0] == pytest.approx(cfg.lr)
    assert lrs[-1] < lrs[0]  # scheduler fired at least once


def test_pocs_engine(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=20, pocs=True, pocs_alpha=0.1, pocs_thresh=5.0)
    solver = DIPSolver(cfg, outchannel=1)
    res = solver.solve(img, mask, seed=0)
    assert len(res.history.df) == 20 and len(res.history.reg) == 20
    # HistoryPOCS parity: adaptive eps and f-k threshold traces
    assert len(res.history.eps) == 20 and len(res.history.th) == 20
    assert all(e > 0 for e in res.history.eps)
    assert all(t > 0 for t in res.history.th)
    assert all(np.isfinite(res.history.loss))
    assert "th=" in res.history.log_message(0)


def test_pocs_fixed_weight(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=10, pocs=True, pocs_weight=0.5)
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    np.testing.assert_allclose(res.history.eps, 0.5, rtol=1e-6)


def test_transfer_init_params(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=40)
    solver = DIPSolver(cfg, outchannel=1)
    res1 = solver.solve(img, mask, seed=0)
    # warm start on the same input canvas resumes near the previous fit
    res2 = solver.solve(img, mask, seed=0, init_params=res1.params)
    assert res2.history.loss[0] < 0.5 * res1.history.loss[0]
    assert res2.history.loss[0] < 2.0 * res1.history.loss[-1]


def test_snapshots(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=30, save_every=10, scan_chunk=10)
    solver = DIPSolver(cfg, outchannel=1)
    res = solver.solve(img, mask, seed=0)
    assert set(res.snapshots.keys()) == {10, 20}
    for v in res.snapshots.values():
        assert v.shape == img.shape


def test_param_noise_runs(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=10, param_noise=True)
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    assert np.isfinite(res.history.loss[-1])


def test_dropout_runs(rng):
    img, mask = synth_problem(rng)
    cfg = tiny_cfg(epochs=10, dropout=0.2)
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    assert np.isfinite(res.history.loss[-1])


def test_mse_loss_and_odd_shape(rng):
    img, mask = synth_problem(rng, nt=35, nx=21)
    cfg = tiny_cfg(epochs=10, loss="mse")
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    assert res.out_best.shape == img.shape


def test_pocs_eps_modes(rng):
    """Adaptive-eps gradient semantics (solver.py pocs_eps_attached).

    In VALUE, total = main + (main/reg)*reg = 2*main in BOTH modes; in
    GRADIENT, 'attached' (the reference as executed, main_pocs.py:190's
    no-op detach) contributes nothing beyond 2*grad(main) — which Adam
    normalises away — while 'stop_grad' (the published intent) actually
    pulls toward the f-k projection.
    """
    img, mask = synth_problem(rng)
    base = dict(epochs=12, scan_chunk=6)
    r_plain = DIPSolver(tiny_cfg(**base), 1).solve(img, mask, seed=0)
    r_att = DIPSolver(tiny_cfg(**base, pocs=True, pocs_eps_mode="attached"),
                      1).solve(img, mask, seed=0)
    r_stop = DIPSolver(tiny_cfg(**base, pocs=True), 1).solve(img, mask, seed=0)

    # value identity in both POCS modes
    for r in (r_att, r_stop):
        np.testing.assert_allclose(np.asarray(r.history.loss),
                                   2 * np.asarray(r.history.df), rtol=1e-4)
    # attached == plain DIP up to Adam's eps + fp drift (gradient is exactly
    # 2*main's; drift compounds chaotically, so compare the early iterates)
    np.testing.assert_allclose(r_att.history.df[:8], r_plain.history.loss[:8],
                               rtol=6e-3, atol=1e-6)
    # stop_grad genuinely regularises: the data-fit trajectory departs by
    # far more than the attached mode's fp drift
    drift_att = np.abs(np.asarray(r_att.history.df[:12])
                       - np.asarray(r_plain.history.loss[:12])).max()
    drift_stop = np.abs(np.asarray(r_stop.history.df[:12])
                        - np.asarray(r_plain.history.loss[:12])).max()
    assert drift_stop > 5 * drift_att, (drift_att, drift_stop)
