"""Model zoo tests: shapes, factory dispatch, init registry, parameter
counts vs the reference architecture geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.config import Config
from deep_prior_interpolation_tpu.models import (MulResUnet, get_net,
                                                 init_weights,
                                                 multires_width)
from deep_prior_interpolation_tpu.models.blocks import (Norm, concat_crop,
                                                        get_activation,
                                                        upsample)


def test_multires_width():
    # width(16) with alpha 1.67: W=26.72 -> 4+8+13=25 (mulresunet.py:15)
    assert multires_width(16) == 25
    assert multires_width(256) == int(1.67 * 256 * 0.167) + \
        int(1.67 * 256 * 0.333) + int(1.67 * 256 * 0.5)


def test_norm_is_batch1_batchnorm(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    m = Norm()
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    yn = np.asarray(y)
    # default scale/bias -> per-channel standardisation over batch+spatial
    np.testing.assert_allclose(yn.mean(axis=(0, 1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(yn.std(axis=(0, 1, 2)), 1, atol=1e-3)


def test_concat_crop():
    a = jnp.ones((1, 10, 9, 2))
    b = jnp.ones((1, 8, 8, 3))
    c = concat_crop([a, b])
    assert c.shape == (1, 8, 8, 5)


def test_upsample_modes():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    n = upsample(x[0], 2, "nearest")
    assert n.shape == (4, 4, 2)
    np.testing.assert_array_equal(np.asarray(n[0, 0]), np.asarray(x[0, 0, 0]))
    l = upsample(x[0], 2, "bilinear")
    assert l.shape == (4, 4, 2)


@pytest.mark.parametrize("ndim,shape", [(2, (1, 48, 32, 8)),
                                        (3, (1, 16, 16, 16, 8))])
def test_mulresunet_shapes(ndim, shape):
    model = MulResUnet(out_channels=1, ndim=ndim, filters=(8, 16, 24),
                       skip=(4, 8))
    x = jnp.zeros(shape)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == shape[:-1] + (1,)


def test_mulresunet_odd_sizes_survive_ladder():
    # center-crop concat lets odd sizes survive the x2 down/up ladder
    model = MulResUnet(out_channels=1, ndim=2, filters=(8, 16), skip=(4,))
    x = jnp.zeros((1, 37, 21, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape[1] <= 37 and y.shape[2] <= 21


def test_factory_dispatch():
    cfg = Config(datadim="2d", filters=[8, 16], skip=[4], inputdepth=4)
    assert isinstance(get_net(cfg, 1), MulResUnet)
    cfg3 = Config(datadim="3d", filters=[8, 16], skip=[4], inputdepth=4)
    net3 = get_net(cfg3, 1)
    assert net3.ndim == 3


def test_init_weights_registry():
    model = MulResUnet(out_channels=1, ndim=2, filters=(8, 16), skip=(4,))
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    for itype in ["xavier", "normal", "kaiming", "orthogonal"]:
        p = init_weights(params, jax.random.PRNGKey(1), itype, 0.02)
        leaves = jax.tree_util.tree_flatten_with_path(p)[0]
        for path, leaf in leaves:
            name = path[-1].key
            if name == "scale":
                assert 8.0 < float(jnp.mean(leaf)) < 12.0  # N(10, 0.2) quirk
            elif name == "bias":
                assert float(jnp.max(jnp.abs(leaf))) == 0.0

    # xavier std check on one conv kernel
    p = init_weights(params, jax.random.PRNGKey(2), "xavier", 1.0)
    ker = [l for pa, l in jax.tree_util.tree_flatten_with_path(p)[0]
           if pa[-1].key == "kernel" and l.ndim == 4][0]
    fan_in = ker.shape[0] * ker.shape[1] * ker.shape[2]
    fan_out = ker.shape[0] * ker.shape[1] * ker.shape[3]
    expected = np.sqrt(2.0 / (fan_in + fan_out))
    assert 0.5 * expected < float(jnp.std(ker)) < 1.5 * expected


def test_activations():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(get_activation("LeakyReLU")(x)),
                               [-0.2, 0.0, 2.0], atol=1e-6)
    assert get_activation("none")(x) is x
    with pytest.raises(NotImplementedError):
        get_activation("bogus")
