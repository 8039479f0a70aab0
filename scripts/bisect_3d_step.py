"""Mechanical bisect of the 3D torch-parity gap (VERDICT r2 item 1).

golden_3d.json compares SNR *distributions* (different RNG streams), which
cannot localise a semantic divergence. This script removes the randomness:
it maps the reference MulResUnet3D's torch parameters ONTO our flax param
tree (explicit structural mapping, no positional guessing) and compares, at
identical params and identical input:

  1. the forward pass (pins conv padding/stride offsets, batch-1 BN,
     trilinear upsample semantics, concat order, activations);
  2. the masked-L1 loss value;
  3. every parameter gradient (pins the full backward pass);
  4. K Adam(1e-3) steps run side by side (pins optax.adam == torch.optim.Adam
     semantics) — forward output compared after every step.

Also cross-checks the x2 upsample primitives standalone (nearest +
trilinear align_corners=False) since they are the most convention-prone op.

Reference structure being mapped: Block3d/ResPath3d/MulResUnet3D
(/root/reference/architectures/mulresunet.py:67-113,188-259), conv3dbn
(/root/reference/architectures/base.py:169-216).

Usage: python scripts/bisect_3d_step.py [--steps 5] [--out bisect_3d.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from golden_3d import _torch_net, make_problem, INPUTDEPTH, SHAPE  # noqa: E402


# ----------------------------------------------------------------------
# torch -> flax param mapping (explicit structural walk)
# ----------------------------------------------------------------------

def _w(t):
    """torch Conv3d weight (out,in,kD,kH,kW) -> flax kernel (kD,kH,kW,in,out)."""
    return np.ascontiguousarray(t.detach().numpy().transpose(2, 3, 4, 1, 0))


def _conv3dbn(seq):
    """conv3dbn Sequential -> ConvNormAct params {'Conv_0', 'Norm_0'}."""
    conv = seq[0][0]  # conv3d() wraps the Conv3d in its own Sequential
    bn = seq[1]
    return {
        "Conv_0": {"kernel": _w(conv.weight),
                   "bias": conv.bias.detach().numpy().copy()},
        "Norm_0": {"scale": bn.weight.detach().numpy().copy(),
                   "bias": bn.bias.detach().numpy().copy()},
    }


def _block3d(b):
    """Block3d -> MultiResBlock params."""
    return {
        "ConvNormAct_0": _conv3dbn(b.conv3x3),
        "ConvNormAct_1": _conv3dbn(b.conv5x5),
        "ConvNormAct_2": _conv3dbn(b.conv7x7),
        "Norm_0": {"scale": b.bn1.weight.detach().numpy().copy(),
                   "bias": b.bn1.bias.detach().numpy().copy()},
        "ConvNormAct_3": _conv3dbn(b.shortcut),
        "Norm_1": {"scale": b.bn2.weight.detach().numpy().copy(),
                   "bias": b.bn2.bias.detach().numpy().copy()},
    }


def _respath3d(r):
    return {
        "ConvNormAct_0": _conv3dbn(r.conv3x3),
        "ConvNormAct_1": _conv3dbn(r.conv1x1),
        "Norm_0": {"scale": r.bn.weight.detach().numpy().copy(),
                   "bias": r.bn.bias.detach().numpy().copy()},
    }


def torch_to_flax_params(net) -> dict:
    """Walk the reference MulResUnet3D Sequential and emit our param tree.

    Our creation order (models/mulresunet.py __call__): entry block
    MultiResBlock_0; per level i=1..4: ResPath_{i-1}, Conv_{i-1} (stride-2),
    Norm_{i-1}, MultiResBlock_{i} (encoder); decoders on the way out:
    MultiResBlock_{5..8} (deepest first); output head Conv_4.
    """
    params: dict = {}
    params["MultiResBlock_0"] = _block3d(net[0])

    container = net  # holds [*, Concat3D, Block3d_decoder, ...] at each level
    cat_idx = 1
    level = 1
    dec_by_level = {}
    while True:
        cat = container[cat_idx]
        skip_seq = cat._modules["0"]   # Sequential([ResPath3d])
        deeper = cat._modules["1"]     # Sequential
        params[f"ResPath_{level - 1}"] = _respath3d(skip_seq[0])
        down_conv = deeper[0][0]       # conv3d() Sequential -> Conv3d stride-2
        params[f"Conv_{level - 1}"] = {
            "kernel": _w(down_conv.weight),
            "bias": down_conv.bias.detach().numpy().copy()}
        bn = deeper[1]
        params[f"Norm_{level - 1}"] = {
            "scale": bn.weight.detach().numpy().copy(),
            "bias": bn.bias.detach().numpy().copy()}
        params[f"MultiResBlock_{level}"] = _block3d(deeper[4])  # encoder
        dec_by_level[level] = _block3d(container[cat_idx + 1])  # decoder
        # recurse: deeper_main (if present) is deeper[5] and holds the next
        # level's [Concat3D, Block3d]; at the deepest level slot 5 holds the
        # Upsample instead
        import torch as _torch
        nxt = deeper[5]
        nxt_raw = nxt._m if hasattr(nxt, "_m") else nxt
        if isinstance(nxt_raw, _torch.nn.Sequential):
            container, cat_idx = nxt, 0
            level += 1
        else:
            break
    n_levels = level
    for lv in range(n_levels, 0, -1):
        params[f"MultiResBlock_{2 * n_levels + 1 - lv}"] = dec_by_level[lv]

    # output head: the conv3d Sequential right after the top-level decoder
    out_conv = net[3][0]
    params[f"Conv_{n_levels}"] = {
        "kernel": _w(out_conv.weight),
        "bias": out_conv.bias.detach().numpy().copy()}
    return params


# ----------------------------------------------------------------------
# comparisons
# ----------------------------------------------------------------------

def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    den = np.abs(b).max() or 1.0
    return float(np.abs(a - b).max() / den)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", type=str, default="bisect_3d.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    from deep_prior_interpolation_tpu.config import Config
    from deep_prior_interpolation_tpu.models import get_net
    from deep_prior_interpolation_tpu.models.blocks import upsample

    report: dict = {}

    # --- 0. upsample primitives standalone -----------------------------
    rng = np.random.RandomState(7)
    vol = rng.randn(1, 6, 5, 4, 3).astype(np.float32)  # odd sizes on purpose
    vt = torch.from_numpy(vol.transpose(0, 4, 1, 2, 3))
    for mode, tmode in (("nearest", "nearest"), ("trilinear", "trilinear")):
        ours = upsample(jnp.asarray(vol[0]), 2, mode)
        ref = F.interpolate(vt, scale_factor=2, mode=tmode,
                            align_corners=False if tmode != "nearest" else None)
        ref = ref.numpy()[0].transpose(1, 2, 3, 0)
        report[f"upsample_{mode}_rel_err"] = rel_err(ours, ref)
        print(f"upsample[{mode}] rel err: {report[f'upsample_{mode}_rel_err']:.2e}")

    # --- 1. build both nets, transfer params ---------------------------
    net = _torch_net(seed=0)
    net.train()
    cfg = Config(datadim="3d", inputdepth=INPUTDEPTH, upsample="linear")
    model = get_net(cfg, outchannel=1)
    dummy = jnp.zeros((1,) + SHAPE + (INPUTDEPTH,))
    ref_tree = model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"]
    mapped = torch_to_flax_params(net)

    # structural audit: the mapped tree must cover the flax tree exactly
    flat_ref = {jax.tree_util.keystr(p): l.shape for p, l in
                jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    flat_map = {jax.tree_util.keystr(p): np.asarray(l).shape for p, l in
                jax.tree_util.tree_flatten_with_path(mapped)[0]}
    assert flat_ref.keys() == flat_map.keys(), (
        sorted(set(flat_ref) ^ set(flat_map))[:10])
    mismatched = [k for k in flat_ref if flat_ref[k] != flat_map[k]]
    assert not mismatched, mismatched[:10]
    params = jax.tree_util.tree_map(jnp.asarray, mapped)
    print(f"param transfer: {len(flat_ref)} leaves, all shapes match")

    # --- 2. forward at identical params/input --------------------------
    inp = rng.randn(1, INPUTDEPTH, *SHAPE).astype(np.float32) * 0.1
    inp_t = torch.from_numpy(inp)
    inp_j = jnp.asarray(inp.transpose(0, 2, 3, 4, 1))

    with torch.no_grad():
        out_t = net(inp_t).numpy()[0].transpose(1, 2, 3, 0)
    out_j = np.asarray(model.apply({"params": params}, inp_j))[0]
    report["forward_rel_err"] = rel_err(out_j, out_t)
    report["forward_std_ratio"] = float(out_j.std() / out_t.std())
    print(f"forward rel err: {report['forward_rel_err']:.2e}  "
          f"std ratio: {report['forward_std_ratio']:.6f}")

    # --- 3. loss + full gradient compare --------------------------------
    img, mask = make_problem(0)
    img_t = torch.from_numpy(img[None].transpose(0, 4, 1, 2, 3)).float()
    mask_t = torch.from_numpy(mask[None].transpose(0, 4, 1, 2, 3)).float()
    img_j = jnp.asarray(img[None])
    mask_j = jnp.asarray(mask[None])

    def loss_fn(p):
        out = model.apply({"params": p}, inp_j)
        return jnp.mean(jnp.abs(out * mask_j - img_j * mask_j))

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)

    net.zero_grad()
    out_full = net(inp_t)
    loss_torch = torch.nn.L1Loss()(out_full * mask_t, img_t * mask_t)
    loss_torch.backward()
    report["loss_ours"] = float(loss_j)
    report["loss_ref"] = float(loss_torch.item())
    print(f"loss ours {float(loss_j):.8f} vs ref {loss_torch.item():.8f}")

    # map torch grads through the same walker (grad lives on .grad)
    class GradView:
        """Presents mod.weight.grad as .weight for the existing walkers."""
        def __init__(self, mod):
            self._m = mod

        def __getattr__(self, k):
            v = getattr(self._m, k)
            if isinstance(v, torch.nn.Parameter):
                return v.grad
            if isinstance(v, torch.nn.Module):
                return GradView(v)
            return v

        def __getitem__(self, i):
            return GradView(self._m[i])

        @property
        def _modules(self):
            return {k: GradView(v) for k, v in self._m._modules.items()}

    grads_ref = torch_to_flax_params(GradView(net))
    flat_g = jax.tree_util.tree_flatten_with_path(grads_j)[0]
    flat_r = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(grads_ref)[0]}

    # Classify: conv kernels, Norm scale/bias, conv biases. A conv bias that
    # feeds a BatchNorm has EXACTLY zero gradient in exact arithmetic (the
    # norm subtracts the mean), so both frameworks produce numerical noise
    # there — compare those in ABSOLUTE terms, everything else relatively.
    by_class: dict = {}
    for p, g in flat_g:
        k = jax.tree_util.keystr(p)
        if k.endswith("['kernel']"):
            cls = "conv_kernel"
        elif "Norm" in k.split("[")[-2]:
            cls = "norm_affine"
        elif k == "['Conv_4']['bias']":
            cls = "head_bias"  # output conv: NOT followed by a norm
        else:
            cls = "pre_norm_bias"
        r = flat_r[k]
        e = rel_err(g, r)
        a = float(np.abs(np.asarray(g, np.float64)
                         - np.asarray(r, np.float64)).max())
        mag = float(max(np.abs(np.asarray(r)).max(),
                        np.abs(np.asarray(g)).max()))
        cur = by_class.setdefault(cls, {"max_rel": 0.0, "max_abs": 0.0,
                                        "max_mag": 0.0, "worst": None})
        if e > cur["max_rel"]:
            cur["max_rel"], cur["worst"] = e, k
        cur["max_abs"] = max(cur["max_abs"], a)
        cur["max_mag"] = max(cur["max_mag"], mag)
    report["grad_by_class"] = by_class
    for cls, st in by_class.items():
        print(f"grad[{cls}]: max rel {st['max_rel']:.2e}  "
              f"max abs diff {st['max_abs']:.2e}  "
              f"max magnitude {st['max_mag']:.2e}  ({st['worst']})")

    # --- 4a. K side-by-side SGD steps ------------------------------------
    # SGD's update is linear in the gradient, so it does NOT amplify the
    # sign-of-noise on the exactly-zero pre-norm bias gradients the way Adam
    # (update ~ g/|g| when v ~ g^2) does. If gradients are semantically
    # right, the SGD trajectories must track each other tightly.
    import copy
    net_sgd = copy.deepcopy(net)
    opt_ts = torch.optim.SGD(net_sgd.parameters(), lr=1e-2)
    params_s = params
    sgd_errs = []
    for k in range(args.steps):
        opt_ts.zero_grad()
        torch.nn.L1Loss()(net_sgd(inp_t) * mask_t, img_t * mask_t).backward()
        opt_ts.step()
        g = jax.grad(loss_fn)(params_s)
        params_s = jax.tree_util.tree_map(lambda p, gg: p - 1e-2 * gg,
                                          params_s, g)
        with torch.no_grad():
            o_t = net_sgd(inp_t).numpy()[0].transpose(1, 2, 3, 0)
        o_j = np.asarray(model.apply({"params": params_s}, inp_j))[0]
        sgd_errs.append(rel_err(o_j, o_t))
        print(f"after SGD step {k + 1}: forward rel err {sgd_errs[-1]:.2e}")
    report["sgd_step_forward_rel_errs"] = sgd_errs

    # --- 4a-control: torch vs torch with an fp-noise perturbation --------
    # Lyapunov control: if a 1e-6-relative parameter perturbation of the
    # SAME torch net diverges at the same rate under identical SGD steps,
    # then cross-framework trajectory divergence is intrinsic chaos (every
    # Norm divides by data-dependent statistics), not a semantic gap — and
    # statistical (multi-seed) goldens are the correct parity instrument.
    net_a = copy.deepcopy(net)
    net_b = copy.deepcopy(net)
    with torch.no_grad():
        for p in net_b.parameters():
            p.add_(1e-6 * p.abs().mean() * torch.randn_like(p))
    opt_a = torch.optim.SGD(net_a.parameters(), lr=1e-2)
    opt_b = torch.optim.SGD(net_b.parameters(), lr=1e-2)
    ctrl_errs = []
    for k in range(args.steps):
        for nn_, op in ((net_a, opt_a), (net_b, opt_b)):
            op.zero_grad()
            torch.nn.L1Loss()(nn_(inp_t) * mask_t, img_t * mask_t).backward()
            op.step()
        with torch.no_grad():
            oa = net_a(inp_t).numpy()[0].transpose(1, 2, 3, 0)
            ob = net_b(inp_t).numpy()[0].transpose(1, 2, 3, 0)
        ctrl_errs.append(rel_err(oa, ob))
        print(f"control (torch vs perturbed torch) SGD step {k + 1}: "
              f"forward rel err {ctrl_errs[-1]:.2e}")
    report["control_perturbed_torch_rel_errs"] = ctrl_errs

    # --- 4b. K side-by-side Adam steps -----------------------------------
    opt_t = torch.optim.Adam(net.parameters(), lr=1e-3)
    opt_j = optax.adam(1e-3)
    opt_state = opt_j.init(params)
    step_errs = []
    for k in range(args.steps):
        opt_t.zero_grad()
        out_full = net(inp_t)
        torch.nn.L1Loss()(out_full * mask_t, img_t * mask_t).backward()
        opt_t.step()

        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt_j.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

        with torch.no_grad():
            o_t = net(inp_t).numpy()[0].transpose(1, 2, 3, 0)
        o_j = np.asarray(model.apply({"params": params}, inp_j))[0]
        step_errs.append(rel_err(o_j, o_t))
        print(f"after Adam step {k + 1}: forward rel err {step_errs[-1]:.2e}")
    report["adam_step_forward_rel_errs"] = step_errs

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
