"""Extended model zoo: skip net, attention nets, partial-conv U-Net, plain
U-Net, ConvGRU ensemble — shapes, factory dispatch, solver integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.models import (AttMulResUnet, AttentionUnet,
                                                 CBAM, ConvGRUCell, Decoder,
                                                 Encoder, Ensemble,
                                                 GridAttentionBlock,
                                                 PartialConv, PartialUNet,
                                                 SkipNet, UNet, get_net)


def _init_apply(model, x, *extra):
    params = model.init(jax.random.PRNGKey(0), x, *extra)["params"]
    return model.apply({"params": params}, x, *extra)


def test_skipnet_2d_shape():
    m = SkipNet(out_channels=1, ndim=2, filters=(8, 16, 16), skip=(4, 4, 4))
    y = _init_apply(m, jnp.zeros((1, 32, 32, 4)))
    assert y.shape == (1, 32, 32, 1)


def test_skipnet_3d_shape():
    m = SkipNet(out_channels=1, ndim=3, filters=(8, 16), skip=(4, 4),
                upsample_mode="trilinear")
    y = _init_apply(m, jnp.zeros((1, 16, 16, 8, 4)))
    assert y.shape == (1, 16, 16, 8, 1)


def test_skipnet_downsample_modes():
    for mode in ["avg", "max", "lanczos2"]:
        m = SkipNet(out_channels=1, ndim=2, filters=(8, 8), skip=(4, 4),
                    downsample_mode=mode)
        y = _init_apply(m, jnp.zeros((1, 16, 16, 2)))
        assert y.shape == (1, 16, 16, 1)


def test_skipnet_reflection_pad():
    m = SkipNet(out_channels=1, ndim=2, filters=(8, 8), skip=(4, 4),
                pad="reflection")
    y = _init_apply(m, jnp.zeros((1, 16, 16, 2)))
    assert y.shape == (1, 16, 16, 1)


def test_cbam_preserves_shape():
    y = _init_apply(CBAM(reduction_ratio=4), jnp.ones((1, 16, 16, 8)))
    assert y.shape == (1, 16, 16, 8)


def test_grid_attention():
    gab = GridAttentionBlock(f_int=8)
    g = jnp.ones((1, 8, 8, 16))
    x = jnp.ones((1, 16, 16, 8))
    params = gab.init(jax.random.PRNGKey(0), g, x)["params"]
    y = gab.apply({"params": params}, g, x)
    assert y.shape == (1, 16, 16, 8)


def test_attmultiunet_shape():
    m = AttMulResUnet(out_channels=1, filters=(8, 16, 24))
    y = _init_apply(m, jnp.zeros((1, 32, 32, 4)))
    assert y.shape == (1, 32, 32, 1)


def test_attention_unet_shape():
    m = AttentionUnet(out_channels=1)
    y = _init_apply(m, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 1)


def test_partial_conv_renormalisation():
    """With an all-ones kernel the renormalised response of a constant input
    is exactly 1 everywhere visible, for ANY mask
    (partial_unet.py:63-66: output = W(X.*M)/M_count)."""
    pc = PartialConv(features=1, kernel_size=3, ndim=2, use_bias=False,
                     use_norm=False, act="none")
    x = jnp.ones((1, 8, 8, 1))
    full = jnp.ones((1, 8, 8, 1))
    half = full.at[:, :, ::2].set(0.0)
    params = pc.init(jax.random.PRNGKey(3), x, full)["params"]
    params = jax.tree_util.tree_map(jnp.ones_like, params)  # ones kernel
    y_full, m_full = pc.apply({"params": params}, x, full)
    y_half, m_half = pc.apply({"params": params}, x, half)
    np.testing.assert_allclose(np.asarray(y_full), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_half), 1.0, rtol=1e-5)
    assert float(jnp.min(m_full)) == 1.0


def test_partial_conv_holes_are_zero():
    pc = PartialConv(features=2, kernel_size=3, ndim=2, use_norm=False,
                     act="none")
    x = jnp.ones((1, 8, 8, 1))
    mask = jnp.zeros((1, 8, 8, 1))  # everything masked -> all holes
    params = pc.init(jax.random.PRNGKey(0), x, mask)["params"]
    y, m = pc.apply({"params": params}, x, mask)
    assert float(jnp.max(jnp.abs(y))) == 0.0
    assert float(jnp.max(m)) == 0.0


@pytest.mark.parametrize("ndim,shape", [(2, (1, 32, 32, 4)),
                                        (3, (1, 16, 16, 16, 4))])
def test_partial_unet_shapes(ndim, shape):
    m = PartialUNet(out_channels=1, ndim=ndim)
    x = jnp.zeros(shape)
    y = _init_apply(m, x, jnp.ones_like(x))
    assert y.shape == shape[:-1] + (1,)


def test_partial_unet_via_solver(rng):
    """--net part works end-to-end (the reference crashes, SURVEY §2.4 #8)."""
    from deep_prior_interpolation_tpu.engine import DIPSolver
    img = rng.randn(32, 32, 1).astype(np.float32)
    mask = np.repeat((rng.rand(1, 32, 1) > 0.5).astype(np.float32), 32, 0)
    cfg = Config(datadim="2d", net="part", epochs=6, inputdepth=4,
                 scan_chunk=3, gain=1.0)
    res = DIPSolver(cfg, outchannel=1).solve(img, mask, seed=0)
    assert np.isfinite(res.history.loss[-1])
    assert res.out_best.shape == img.shape


def test_unet_shapes():
    for mode in ["nearest", "deconv"]:
        m = UNet(out_channels=1, ndim=2, filters=(8, 16, 24, 32, 48),
                 upsample_mode=mode)
        y = _init_apply(m, jnp.zeros((1, 32, 32, 4)))
        assert y.shape == (1, 32, 32, 1)


def test_unet_concat_x():
    m = UNet(out_channels=1, ndim=2, filters=(8, 16, 24, 32, 48),
             concat_x=True)
    y = _init_apply(m, jnp.zeros((1, 32, 32, 2)))
    assert y.shape == (1, 32, 32, 1)


def test_convgru_cell():
    cell = ConvGRUCell(hidden=8)
    x = jnp.ones((1, 8, 8, 4))
    state = jnp.zeros((1, 8, 8, 8))
    params = cell.init(jax.random.PRNGKey(0), x, state)["params"]
    s1 = cell.apply({"params": params}, x, state)
    assert s1.shape == state.shape
    # orthogonal-init gates: state must move from zero
    assert float(jnp.max(jnp.abs(s1))) > 0


def test_convgru_ensemble():
    m = Ensemble(out_channels=1, num_frames=2, hidden=32)
    y = _init_apply(m, jnp.zeros((1, 64, 64, 1)))
    assert y.shape == (2, 64, 64, 1)  # frames stacked on batch


def test_factory_all_nets():
    for name in ["multiunet", "attmultiunet", "part", "unet", "skip"]:
        cfg = Config(datadim="2d", net=name, filters=[8, 16, 24, 32, 48],
                     skip=[4, 8, 8, 8], inputdepth=4)
        net = get_net(cfg, 1)
        assert net is not None
    cfg3 = Config(datadim="3d", net="skip", filters=[8, 16], skip=[4],
                  inputdepth=4)
    assert isinstance(get_net(cfg3, 1), SkipNet)
    with pytest.raises(ValueError):
        get_net(Config(datadim="3d", net="attmultiunet"), 1)
