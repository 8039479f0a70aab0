"""Component micro-benchmarks on the real TPU (forced-fetch timing).

Breaks the DIP step at the bench's medium shape into parts to find where
the ~180 ms/iter goes: model forward, forward+backward, upsampling, norms,
RNG, loss/metrics.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deep_prior_interpolation_tpu.models import MulResUnet
from deep_prior_interpolation_tpu.models.blocks import Norm, upsample
from deep_prior_interpolation_tpu.ops import losses as L

SHAPE = tuple(int(v) for v in
              (sys.argv[1] if len(sys.argv) > 1 else "128,64,64").split(","))
D = 64


def timed(name, fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: None, out)
    # force materialisation
    s = jnp.sum(jax.tree_util.tree_leaves(out)[0])
    _ = float(s)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    s = sum(float(jnp.sum(jax.tree_util.tree_leaves(out)[0])) for _ in [0])
    dt = (time.time() - t0) / n * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


def main():
    model = MulResUnet(out_channels=1, ndim=3, upsample_mode="trilinear",
                       dtype=jnp.bfloat16, remat=True, remat_levels=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1,) + SHAPE + (D,)) * 0.1
    img = jax.random.normal(jax.random.PRNGKey(1), (1,) + SHAPE + (1,))
    mask = jnp.ones_like(img)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    print("params ready", flush=True)

    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    timed("forward", fwd, params, x)

    def loss_of(p, xx):
        out = model.apply({"params": p}, xx)
        return L.masked_mae(out, img, mask)

    fwd_bwd = jax.jit(jax.grad(loss_of))
    timed("forward+backward", fwd_bwd, params, x)

    # RNG + input add
    noise_step = jax.jit(lambda k: x + 0.03 * jax.random.normal(k, x.shape, x.dtype))
    timed("reg-noise gen+add", noise_step, jax.random.PRNGKey(3))

    # metrics
    met = jax.jit(lambda o: (L.snr(o, img), L.pcorr(o, img)))
    out = fwd(params, x)
    timed("snr+pcorr", met, out)

    # upsample chains
    v = jax.random.normal(jax.random.PRNGKey(4),
                          (1, SHAPE[0] // 2, SHAPE[1] // 2, SHAPE[2] // 2, 42),
                          jnp.bfloat16)
    up_tri = jax.jit(lambda h: upsample(h[0], 2, "bilinear")[None])
    timed("trilinear upsample x2 (42ch half-res)", up_tri, v)
    up_nn = jax.jit(lambda h: upsample(h[0], 2, "nearest")[None])
    timed("nearest upsample x2 (42ch half-res)", up_nn, v)

    # a full-res norm
    big = jax.random.normal(jax.random.PRNGKey(5), (1,) + SHAPE + (25,), jnp.bfloat16)
    norm = Norm()
    np_ = norm.init(jax.random.PRNGKey(6), big)
    nfn = jax.jit(lambda b: norm.apply(np_, b))
    timed("Norm (25ch full-res)", nfn, big)


if __name__ == "__main__":
    main()
