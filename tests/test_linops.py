"""Linear-operator library: adjoint dot-tests as asserted properties
(generalising the reference's print-only dottest, operators/base.py:53-67),
slopes, and Langevin optimizers."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_prior_interpolation_tpu.ops import (Hale2D, LinearOperator,
                                              auto_adjoint, avo_modelling,
                                              chain, directional_laplacian,
                                              dottest, hessian,
                                              ricker_wavelet,
                                              structure_tensor_dips,
                                              vertical_conv, vertical_grad)
from deep_prior_interpolation_tpu.engine import psgld, sgld

TOL = 1e-3


def test_vertical_grad_adjoint():
    op = vertical_grad()
    shape = (1, 16, 8, 2)
    abs_err, rel_err = dottest(op, shape, shape)
    assert rel_err < TOL


def test_vertical_conv_adjoint():
    wav = np.asarray(ricker_wavelet(15, 3.0))
    op = vertical_conv(wav)
    shape = (1, 32, 6, 1)
    _, rel_err = dottest(op, shape, shape)
    assert rel_err < TOL


def test_avo_adjoint_and_shapes():
    theta = jnp.array([0.0, 10.0, 20.0, 30.0])
    op = avo_modelling(theta, vsvp=0.5, nt0=16, spatdims=(8,))
    x = jnp.ones((1, 16, 8, 3))
    y = op(x)
    assert y.shape == (1, 16, 8, 4)
    _, rel_err = dottest(op, (1, 16, 8, 3), (1, 16, 8, 4))
    assert rel_err < TOL


def test_avo_fatti():
    theta = jnp.array([5.0, 15.0])
    op = avo_modelling(theta, vsvp=0.5, nt0=4, linearization="fatti")
    _, rel_err = dottest(op, (1, 4, 3), (1, 4, 2))
    assert rel_err < TOL


def test_chain_and_hessian():
    g = vertical_grad()
    c = chain([g, g])
    shape = (1, 16, 4, 1)
    _, rel_err = dottest(c, shape, shape)
    assert rel_err < TOL
    h = hessian(g)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    # normal operator is self-adjoint and PSD
    np.testing.assert_allclose(np.asarray(h(x)), np.asarray(h.adjoint(x)),
                               atol=1e-6)
    assert float(jnp.vdot(x.ravel(), h(x).ravel())) >= -1e-5


def test_auto_adjoint_matches_manual():
    """jax.linear_transpose derives the exact adjoint automatically."""
    manual = vertical_grad()
    x = jnp.zeros((1, 12, 6, 1))
    auto = auto_adjoint(manual.forward, x)
    y = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    np.testing.assert_allclose(np.asarray(auto.adjoint(y)),
                               np.asarray(manual.adjoint(y)), atol=1e-6)


def test_structure_tensor_dips():
    # a volume of perfectly horizontal events -> dip ~ 0 where defined
    t = jnp.linspace(0, 4 * jnp.pi, 64)
    img = jnp.tile(jnp.sin(t)[None, :, None, None], (1, 1, 32, 1))
    phi, aniso = structure_tensor_dips(img)
    assert phi.shape == img.shape
    assert float(jnp.nanmax(jnp.abs(phi))) < 0.3
    assert jnp.all(jnp.isfinite(phi))


def test_directional_laplacian_and_hale():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    theta = jnp.zeros_like(x)
    d1 = directional_laplacian(x, theta)
    h = Hale2D(theta)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(h(x)), atol=1e-6)


def _quadratic_problem():
    target = jnp.array([1.0, -2.0, 3.0])

    def loss(p):
        return jnp.sum((p - target) ** 2)

    return target, loss


@pytest.mark.parametrize("opt", [sgld(lr=0.05, noise_scale=1e-6),
                                 sgld(lr=0.05, noise_scale=1e-6, momentum=0.9)])
def test_sgld_converges_with_tiny_noise(opt):
    target, loss = _quadratic_problem()
    p = jnp.zeros(3)
    state = opt.init(p)
    for _ in range(200):
        g = jax.grad(loss)(p)
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
    assert float(loss(p)) < 0.1


def test_psgld_samples_around_mode():
    """pSGLD is a posterior sampler: the mean of its iterates must approach
    the quadratic's mode (optimizers.py:110-183 semantics)."""
    target, loss = _quadratic_problem()
    opt = psgld(lr=5e-3, Lambda=1e-1)
    p = jnp.zeros(3)
    state = opt.init(p)
    trace = []
    for i in range(1000):
        g = jax.grad(loss)(p)
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
        if i >= 500:
            trace.append(np.asarray(p))
    mean = np.mean(trace, axis=0)
    np.testing.assert_allclose(mean, np.asarray(target), atol=0.5)


def test_sgld_noise_scale_visible():
    """With a large noise scale the iterates must jitter."""
    opt = sgld(lr=0.0, noise_scale=1.0)
    p = jnp.zeros(1000)
    state = opt.init(p)
    upd, _ = opt.update(jnp.zeros(1000), state, p)
    assert 0.8 < float(jnp.std(upd)) < 1.2


def test_optimizer_validation():
    with pytest.raises(ValueError):
        sgld(lr=-1.0)
    with pytest.raises(ValueError):
        sgld(lr=0.1, nesterov=True)  # needs momentum
    with pytest.raises(ValueError):
        psgld(beta=-0.5)


def test_sgld_momentum_matches_torch_sgd_with_dampening():
    """torch SGD initialises the momentum buffer to d_p itself on step one
    (dampening only from step 2); with zero noise SGLD must trace the same
    trajectory (reference optimizers.py:94-97)."""
    import torch

    g_seq = [np.array([1.0, -2.0], np.float32),
             np.array([0.5, 0.25], np.float32),
             np.array([-1.5, 3.0], np.float32)]
    lr, mom, damp = 0.1, 0.9, 0.3

    p_t = torch.zeros(2, requires_grad=True)
    opt_t = torch.optim.SGD([p_t], lr=lr, momentum=mom, dampening=damp)
    for g in g_seq:
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()

    opt_j = sgld(lr=lr, noise_scale=0.0, momentum=mom, dampening=damp)
    p_j = jnp.zeros(2)
    state = opt_j.init(p_j)
    for g in g_seq:
        upd, state = opt_j.update(jnp.asarray(g), state, p_j)
        p_j = p_j + upd
    np.testing.assert_allclose(np.asarray(p_j), p_t.detach().numpy(),
                               rtol=1e-6)
