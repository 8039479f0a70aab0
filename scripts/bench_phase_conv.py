"""TPU microbenchmark: standard small-channel 3D convs vs their exact
phase-space (space-to-depth) reformulation.

Hypothesis (from the round-1 conv study): XLA lowers convs as per-tap
matmuls with K=C_in, N=C_out, so efficiency ~ (C_in/128)*(C_out/128) — the
flagship MulResUnet3D's C in {4..25} layers run at 1-6 TF/s. Blocking 2^3
spatial phases into channels turns a same-pad 3^3 conv C_in->C_out into an
exact VALID 2^3 conv (8*C_in -> 8*C_out) at half resolution: 64/27 = 2.37x
the FLOPs but ~8x the lane utilisation on both operands.

Run on the real TPU (ONE process at a time):
  python scripts/bench_phase_conv.py
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

SHAPE = tuple(int(v) for v in
              (sys.argv[1] if len(sys.argv) > 1 else "256,128,128").split(","))
DTYPE = jnp.bfloat16


# --- phase-space machinery (prototype of ops/phase_space.py) -----------

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, D1..Dd, C) -> (N, D1/2..Dd/2, C*2^d), c-major / phase-minor."""
    d = x.ndim - 2
    n, c = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    shp = [n]
    for s in sp:
        shp += [s // 2, 2]
    shp += [c]
    x = x.reshape(shp)
    # (N, p1,2, p2,2, p3,2, C) -> (N, p1..pd, C, 2,2,2)
    perm = [0] + [1 + 2 * i for i in range(d)] + [1 + 2 * d] \
        + [2 + 2 * i for i in range(d)]
    x = x.transpose(perm)
    return x.reshape((n,) + tuple(s // 2 for s in sp) + (c * 2 ** d,))


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    d = x.ndim - 2
    n = x.shape[0]
    sp = x.shape[1:-1]
    c = x.shape[-1] // 2 ** d
    x = x.reshape((n,) + tuple(sp) + (c,) + (2,) * d)
    perm = [0]
    for i in range(d):
        perm += [1 + i, 1 + d + 1 + i]
    perm += [1 + d]
    x = x.transpose(perm)
    return x.reshape((n,) + tuple(2 * s for s in sp) + (c,))


def _phase_grids(d: int, k: int, with_psi: bool):
    kp = k // 2 + 1
    s = np.stack(np.meshgrid(*[np.arange(kp)] * d, indexing="ij"), -1)
    phi = np.stack(np.meshgrid(*[np.arange(2)] * d, indexing="ij"),
                   -1).reshape(-1, d)
    if with_psi:
        # t[s.., phi, psi, dim] = 2 s + phi - psi
        t = (2 * s[..., None, None, :] + phi[..., :, None, :][(None,) * d]
             - phi[..., None, :, :][(None,) * d])
    else:
        t = 2 * s[..., None, :] + phi[(None,) * d]
    valid = ((t >= 0) & (t < k)).all(-1)
    return np.clip(t, 0, k - 1), valid


def phase_kernel(w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """(k..d, Cin, Cout) -> VALID 2^d kernel over phase-blocked tensors.

    stride 1: (kp..d, Cin*B, Cout*B); stride 2: (kp..d, Cin*B, Cout).
    """
    d = w.ndim - 2
    k = w.shape[0]
    b = 2 ** d
    cin, cout = w.shape[-2], w.shape[-1]
    t, valid = _phase_grids(d, k, with_psi=(stride == 1))
    wg = w[tuple(t[..., i] for i in range(d))]
    wg = jnp.where(jnp.asarray(valid)[..., None, None], wg, 0)
    if stride == 1:
        # (kp.., B_phi, B_psi, Cin, Cout) -> (kp.., Cin, B_phi, Cout, B_psi)
        wg = jnp.moveaxis(wg, (-4, -3), (-3, -1))
        return wg.reshape(wg.shape[:d] + (cin * b, cout * b))
    # (kp.., B_phi, Cin, Cout) -> (kp.., Cin, B_phi, Cout)
    wg = jnp.moveaxis(wg, -3, -2)
    return wg.reshape(wg.shape[:d] + (cin * b, cout))


def _dn(d: int):
    sp = "DHW"[-d:]
    return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def conv_std(x, w, stride=1):
    d = w.ndim - 2
    k = w.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * d, [(p, p)] * d, dimension_numbers=_dn(d))


def conv_phase(xp, w, stride=1):
    """xp is the phase-blocked PADDED input; returns phase (stride 1) or
    plain half-res (stride 2) output."""
    d = w.ndim - 2
    wp = phase_kernel(w, stride)
    return jax.lax.conv_general_dilated(
        xp, wp, (1,) * d, "VALID", dimension_numbers=_dn(d))


def to_phase(x, k):
    p = (k - 1) // 2
    d = x.ndim - 2
    if p:
        x = jnp.pad(x, [(0, 0)] + [(p, p)] * d + [(0, 0)])
    return space_to_depth(x)


# --- correctness + timing ----------------------------------------------

def timed(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"  {name}: {dt:.2f} ms", flush=True)
    return dt


def check_exact(cin, cout, k, stride, d=3, sp=(16, 12, 10)):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1,) + sp[:d] + (cin,), jnp.float32)
    w = jax.random.normal(kw, (k,) * d + (cin, cout), jnp.float32) * 0.1
    ref = conv_std(x, w, stride)
    got = conv_phase(to_phase(x, k), w, stride)
    if stride == 1:
        got = depth_to_space(got)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    status = "OK" if err < 1e-5 else "FAIL"
    print(f"exactness k={k} s={stride} {cin}->{cout}: rel err {err:.2e} "
          f"[{status}]", flush=True)
    return err < 1e-5


def bench_case(cin, cout, k, stride=1, fwd_bwd=False):
    d = 3
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = (jax.random.normal(kx, (1,) + SHAPE + (cin,), jnp.float32) * 0.1
         ).astype(DTYPE)
    w = (jax.random.normal(kw, (k,) * d + (cin, cout), jnp.float32) * 0.05
         ).astype(DTYPE)
    vox = int(np.prod(SHAPE)) // (stride ** 3)
    gflop = 2 * vox * (k ** 3) * cin * cout / 1e9

    tag = f"{cin}->{cout} k{k}s{stride}"
    if fwd_bwd:
        f_std = jax.jit(lambda xx, ww: jax.grad(
            lambda a, b: jnp.sum(conv_std(a, b, stride).astype(jnp.float32) ** 2),
            argnums=(0, 1))(xx, ww))
        f_ph = jax.jit(lambda xx, ww: jax.grad(
            lambda a, b: jnp.sum(
                conv_phase(to_phase(a, k), b, stride).astype(jnp.float32) ** 2),
            argnums=(0, 1))(xx, ww))
        t1 = timed(f"std  bwd {tag} ({3*gflop:.0f} GF)", f_std, x, w)
        t2 = timed(f"phase bwd {tag}", f_ph, x, w)
    else:
        f_std = jax.jit(partial(conv_std, stride=stride))
        xp = jax.jit(lambda a: to_phase(a, k))(x)
        f_ph = jax.jit(partial(conv_phase, stride=stride))
        t1 = timed(f"std   {tag} ({gflop:.0f} GF, "
                   f"im2col-eff)", f_std, x, w)
        t2 = timed(f"phase {tag} (conv only)", f_ph, xp, w)
        timed(f"s2d+pad {cin}ch", jax.jit(lambda a: to_phase(a, k)), x, n=10)
    print(f"  => speedup {t1 / t2:.2f}x  (std {gflop/t1:.1f} TF/s, "
          f"phase {2.37*gflop/t2 if stride==1 and k==3 else gflop/t2:.1f} "
          f"TF/s-equiv)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print(f"shape {SHAPE}, dtype {DTYPE.__name__}", flush=True)

    print("--- exactness (f32, small) ---", flush=True)
    ok = True
    ok &= check_exact(5, 7, 3, 1)
    ok &= check_exact(5, 7, 1, 1)
    ok &= check_exact(5, 7, 3, 2)
    ok &= check_exact(3, 4, 3, 1, d=2, sp=(16, 12))
    if not ok:
        print("EXACTNESS FAILED — aborting bench", flush=True)
        return

    print("--- forward (flagship full-res layers) ---", flush=True)
    bench_case(64, 4, 3)     # Block0 first conv (the worst layer)
    bench_case(4, 8, 3)
    bench_case(8, 13, 3)
    bench_case(64, 25, 1)    # shortcut 1x1
    bench_case(25, 16, 3)    # ResPath 3x3
    bench_case(41, 4, 3)     # decoder block first conv
    bench_case(25, 25, 3, stride=2)  # down conv
    bench_case(25, 1, 3)     # head

    print("--- forward+backward (dominant layers) ---", flush=True)
    bench_case(64, 4, 3, fwd_bwd=True)
    bench_case(25, 16, 3, fwd_bwd=True)
    bench_case(8, 13, 3, fwd_bwd=True)


if __name__ == "__main__":
    main()
