"""Multi-patch batching study: how should per-patch convs be vmapped?

Patch-parallel DIP vmaps the solver over patches with INDEPENDENT weights
per patch. ``vmap(conv_general_dilated)`` over (x, w) lowers to a
batch_group_count grouped convolution, measured ~3x slower per patch than a
single-patch program in round 1 (parallel/mesh.py sizing guidance). This
script measures the alternatives on the 2D lines-scale workload where
multi-patch-per-chip batching actually matters (a 170x100 patch
underutilises a chip):

  a. sequential single-patch convs (the per-patch roofline, x B)
  b. vmap -> grouped conv (current behaviour)
  c. vmap -> tap-matmul: y = sum_t shift_t(x) @ W[t]; under vmap every tap
     is a BATCHED matmul (B, M, Cin) @ (B, Cin, Cout), which the MXU runs at
     single-patch efficiency (batch = outer loop), no grouped lowering.

Usage: python scripts/bench_vmap_conv.py [--batch 8] [--iters 30]
       [--platform default|cpu]
"""
from __future__ import annotations

import argparse
import itertools
import time

import numpy as np


def tap_conv(x, w, stride: int = 1):
    """Same-pad conv as a sum of per-tap matmuls. x: (N, *sp, Ci),
    w: (k,..,k, Ci, Co)."""
    import jax.numpy as jnp
    from jax import lax

    d = w.ndim - 2
    k = w.shape[0]
    p = (k - 1) // 2
    x = jnp.pad(x, [(0, 0)] + [(p, p)] * d + [(0, 0)])
    out_sp = tuple((s - k) // stride + 1 for s in x.shape[1:-1])
    y = None
    for t in itertools.product(*[range(k)] * d):
        lim = tuple(t[i] + (out_sp[i] - 1) * stride + 1 for i in range(d))
        xs = lax.slice(x, (0,) + t + (0,),
                       (x.shape[0],) + lim + (x.shape[-1],),
                       (1,) + (stride,) * d + (1,))
        contrib = jnp.tensordot(xs, w[t], axes=[[xs.ndim - 1], [0]])
        y = contrib if y is None else y + contrib
    return y


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--shape", default="176,104")
    ap.add_argument("--channels", default="64,64")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sp = tuple(int(v) for v in args.shape.split(","))
    ci, co = (int(v) for v in args.channels.split(","))
    d = len(sp)
    k = 3
    dt = jnp.dtype(args.dtype)
    B = args.batch

    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (B, 1) + sp + (ci,), dt)
    w = jax.random.normal(kw, (B,) + (k,) * d + (ci, co), dt) * 0.05
    dn = (f"N{'DHW'[-d:]}C", f"{'DHW'[-d:]}IO", f"N{'DHW'[-d:]}C")

    def conv_one(x1, w1):
        p = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x1, w1, (1,) * d, [(p, p)] * d, dimension_numbers=dn)

    def seq(xb, wb):  # per-patch roofline: same weights-per-patch math,
        outs = []     # but no batching — lax.map = sequential loop
        for b in range(B):
            outs.append(conv_one(xb[b], wb[b]))
        return jnp.stack(outs)

    candidates = {
        "sequential": jax.jit(seq),
        "vmap_grouped": jax.jit(jax.vmap(conv_one)),
        "vmap_tapmm": jax.jit(jax.vmap(lambda x1, w1: tap_conv(x1, w1))),
    }

    if ci != co:
        raise SystemExit("need ci == co: timing feeds the output back as the "
                         "next input to force true serialisation (repeated "
                         "identical dispatches mis-measure above chip peak)")
    flops = 2 * B * np.prod(sp) * k ** d * ci * co

    # COMPILED serial loop: round-2's host-driven chain still measured above
    # chip peak through the axon relay (dispatch pipelining hides device
    # time), so the chain lives inside ONE jitted lax.fori_loop returning a
    # SCALAR that the host fetches with float(...) — round 4 found that even
    # block_until_ready through the relay returns before device completion,
    # so only a value round-trip is a valid fence. The per-iter max-renorm
    # keeps a million bf16 conv applications finite; its cost (one 19 MB
    # reduce) is identical across candidates and ~1e-3 of the conv FLOPs.
    def chained(fn):
        def body(i, y):
            y = fn(y, w)
            return (y / jnp.maximum(jnp.max(jnp.abs(y)).astype(y.dtype),
                                    jnp.asarray(1e-3, y.dtype)))
        def run(x0, n):
            y = jax.lax.fori_loop(0, n, body, x0)
            return jnp.sum(y).astype(jnp.float32)
        return jax.jit(run)

    # Timing validity: through the axon relay, a dispatch costs ~ms, so the
    # measured window must be SECONDS of device work or the numbers read
    # above chip peak (as round-3's first attempt did at 30 iters). Calibrate
    # the loop length per candidate until one dispatch runs >= 2 s, then
    # difference a 2x window against it to cancel the fixed relay cost.
    results = {}
    for name, fn in candidates.items():
        loop = chained(fn)
        assert np.isfinite(float(loop(x, 2)))  # compile + sanity
        n = max(args.iters, 8)
        while True:
            t0 = time.time()
            float(loop(x, n))  # scalar fetch = the only real fence
            dt = time.time() - t0
            if dt >= 2.0 or n >= 100_000:
                break
            n = min(100_000, int(n * max(2.0, 3.0 / max(dt, 1e-3))))
        t0 = time.time()
        float(loop(x, 2 * n))
        t1 = time.time()
        dt_s = ((t1 - t0) - dt) / n  # 2n-window minus n-window = n iters
        results[name] = dt_s
        print(f"{name:14s} {dt_s * 1e3:8.3f} ms/apply  "
              f"{flops / dt_s / 1e12:6.2f} TF/s  (n={n})")

    # numeric agreement — reduce ON DEVICE (fetching full volumes over the
    # axon relay tunnel takes tens of minutes for GB-scale arrays)
    y_ref = candidates["sequential"](x, w).astype(jnp.float32)
    y_tap = candidates["vmap_tapmm"](x, w).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y_ref - y_tap)) /
                (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"tap-matmul max rel err vs conv: {err:.2e}")
    print(f"speedup tapmm vs grouped: "
          f"{results['vmap_grouped'] / results['vmap_tapmm']:.2f}x; "
          f"vs sequential: {results['sequential'] / results['vmap_tapmm']:.2f}x")


if __name__ == "__main__":
    main()
