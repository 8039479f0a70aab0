"""Exactness of phase-space (space-to-depth) conv execution.

Every transform must be EXACT (same math, different layout): these tests pin
each primitive against the standard lax conv / jax.image.resize it replaces,
in 2D and 3D, including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_prior_interpolation_tpu.ops import phase_space as ps


def _std_conv(x, w, stride=1):
    d = w.ndim - 2
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * d, [(p, p)] * d,
        dimension_numbers=ps.conv_dimension_numbers(d))


def _mk(rng, sp, cin, cout, k):
    d = len(sp)
    x = jnp.asarray(rng.randn(2, *sp, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(*(k,) * d, cin, cout).astype(np.float32)) * 0.2
    return x, w


@pytest.mark.parametrize("sp", [(8, 6), (8, 6, 4)])
def test_s2d_roundtrip(rng, sp):
    x = jnp.asarray(rng.randn(2, *sp, 3).astype(np.float32))
    xp = ps.space_to_depth(x)
    assert xp.shape == (2,) + tuple(s // 2 for s in sp) + (3 * 2 ** len(sp),)
    np.testing.assert_array_equal(np.asarray(ps.depth_to_space(xp)),
                                  np.asarray(x))


def test_s2d_layout_channel_major(rng):
    """Channel c of phase tensor block b = c*B + lin(phi) holds x[2p+phi, c]."""
    x = jnp.asarray(rng.randn(1, 4, 6, 2).astype(np.float32))
    xp = ps.space_to_depth(x)
    # c=1, phi=(1,0) -> lane 1*4 + 2
    np.testing.assert_array_equal(np.asarray(xp[0, :, :, 6]),
                                  np.asarray(x[0, 1::2, 0::2, 1]))


def test_phase_pad_matches_plain_pad(rng):
    x = jnp.asarray(rng.randn(1, 6, 4, 3).astype(np.float32))
    xp = ps.phase_pad(ps.space_to_depth(x))
    ref = ps.space_to_depth(jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)]))
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(ref))


@pytest.mark.parametrize("k,sp", [(3, (8, 6)), (1, (8, 6)),
                                  (3, (8, 6, 4)), (1, (8, 6, 4))])
def test_phase_conv_exact(rng, k, sp):
    x, w = _mk(rng, sp, 5, 7, k)
    ref = _std_conv(x, w)
    got = ps.depth_to_space(ps.phase_conv(ps.space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,sp", [(3, (8, 6)), (1, (8, 6)), (3, (8, 6, 4))])
def test_phase_entry_conv_exact(rng, k, sp):
    x, w = _mk(rng, sp, 5, 7, k)
    ref = ps.space_to_depth(_std_conv(x, w))
    got = ps.phase_entry_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sp", [(8, 6), (8, 6, 4)])
def test_phase_exit_conv_exact(rng, sp):
    x, w = _mk(rng, sp, 5, 7, 3)
    ref = _std_conv(x, w, stride=2)
    got = ps.phase_exit_conv(ps.space_to_depth(x), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_conv_gradients_match(rng):
    x, w = _mk(rng, (8, 6, 4), 3, 5, 3)

    def loss_std(ww, xx):
        return jnp.sum(_std_conv(xx, ww) ** 2)

    def loss_ph(ww, xx):
        return jnp.sum(ps.phase_conv(ps.space_to_depth(xx), ww) ** 2)

    gw_s, gx_s = jax.grad(loss_std, argnums=(0, 1))(w, x)
    gw_p, gx_p = jax.grad(loss_ph, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sp", [(8, 6), (6, 4, 4)])
def test_upsample_into_phase_nearest(rng, sp):
    x = jnp.asarray(rng.randn(1, *sp, 3).astype(np.float32))
    got = ps.depth_to_space(ps.upsample_into_phase(x, "nearest"))
    ref = x
    for ax in range(1, len(sp) + 1):
        ref = jnp.repeat(ref, 2, axis=ax)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("sp", [(8, 6), (6, 4, 4)])
def test_upsample_into_phase_linear(rng, sp):
    x = jnp.asarray(rng.randn(1, *sp, 3).astype(np.float32))
    got = ps.depth_to_space(ps.upsample_into_phase(x, "linear"))
    ref = jax.image.resize(
        x, (1,) + tuple(2 * s for s in sp) + (3,), method="linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_concat_commutes_with_phase(rng):
    """Channel-major layout: concat of phase tensors == phase of concat."""
    a = jnp.asarray(rng.randn(1, 4, 6, 2).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
    lhs = jnp.concatenate([ps.space_to_depth(a), ps.space_to_depth(b)], -1)
    rhs = ps.space_to_depth(jnp.concatenate([a, b], -1))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize("ndim,sp,phase_levels,deep", [
    (3, (16, 8, 8), 2, 0), (3, (16, 16, 8), None, 0), (2, (16, 8), 2, 0),
    (3, (16, 8, 8), 2, 1), (2, (16, 8), 2, 1), (3, (16, 16, 8), 2, 2)])
def test_mulresunet_phase_space_exact(ndim, sp, phase_levels, deep):
    """MulResUnet(phase_space=True) is the SAME network (identical params)
    as the standard execution: outputs and parameter gradients match.

    Uses a LOCAL RandomState (not the session ``rng``): an exactness pin
    must test a fixed input, and the session fixture's state at this point
    depends on every previously-run test (a suite-order change once pushed
    a tail input past the tolerance while any standalone run passed).
    """
    from deep_prior_interpolation_tpu.models import MulResUnet

    kw = dict(out_channels=1, ndim=ndim, filters=(4, 8, 16), skip=(4, 8),
              upsample_mode="trilinear" if ndim == 3 else "bilinear")
    m_std = MulResUnet(**kw)
    m_ph = MulResUnet(**kw, phase_space=True, phase_levels=phase_levels,
                      phase_deep_levels=deep)

    x = jnp.asarray(np.random.RandomState(1234 + ndim)
                    .randn(1, *sp, 6).astype(np.float32))
    params = m_std.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees: the phase model must accept the std params
    y_std = m_std.apply({"params": params}, x)
    y_ph = m_ph.apply({"params": params}, x)
    assert y_std.shape == y_ph.shape
    scale = float(jnp.max(jnp.abs(y_std))) + 1e-9
    np.testing.assert_allclose(np.asarray(y_ph) / scale,
                               np.asarray(y_std) / scale, atol=2e-5)

    def loss(m, p):
        return jnp.mean(m.apply({"params": p}, x) ** 2)

    g_std = jax.grad(lambda p: loss(m_std, p))(params)
    g_ph = jax.grad(lambda p: loss(m_ph, p))(params)
    flat_s = jax.tree_util.tree_leaves(g_std)
    flat_p = jax.tree_util.tree_leaves(g_ph)
    # normalise by the GLOBAL gradient scale: biases feeding straight into a
    # Norm have mathematically zero gradient, so their per-leaf relative
    # error is pure cancellation noise
    gs = max(float(jnp.max(jnp.abs(a))) for a in flat_s) + 1e-9
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b) / gs, np.asarray(a) / gs,
                                   atol=5e-5)


def test_mulresunet_phase_space_bf16_close(rng):
    """bf16 phase execution stays within bf16 tolerance of bf16 standard."""
    from deep_prior_interpolation_tpu.models import MulResUnet

    kw = dict(out_channels=1, ndim=3, filters=(4, 8), skip=(4,),
              dtype=jnp.bfloat16)
    m_std = MulResUnet(**kw)
    m_ph = MulResUnet(**kw, phase_space=True, phase_levels=None)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4).astype(np.float32))
    params = m_std.init(jax.random.PRNGKey(0), x)["params"]
    y_std = np.asarray(m_std.apply({"params": params}, x), np.float32)
    y_ph = np.asarray(m_ph.apply({"params": params}, x), np.float32)
    scale = np.abs(y_std).max() + 1e-9
    np.testing.assert_allclose(y_ph / scale, y_std / scale, atol=0.05)
