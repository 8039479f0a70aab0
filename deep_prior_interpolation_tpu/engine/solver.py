"""The DIP solver: per-patch optimisation as a jitted, chunked ``lax.scan``.

This is the TPU-native re-design of the reference optimisation drivers
(/root/reference/main.py:141-220 and main_pocs.py:160-254). The reference
runs a Python epoch loop with per-iteration host syncs (``.item()`` metric
reads, ``torch_to_np`` best-output copies, main.py:165-182). Here the whole
loop state — params, Adam moments, RNG key, best-loss output volume, LR
scheduler and early-stopping counters — lives in the scan carry in HBM and is
read back once per chunk, so the hot loop is a single fused XLA program.

Feature parity in the step:
  * fresh input noise every iteration (main.py:148-150)
  * optional parameter noise (main.py:143-145; implemented *working* — the
    reference rebinds a loop variable so its version is a no-op)
  * data-forgetting input ramp (main.py:152-155)
  * masked L1/L2 data fit (main.py:161)
  * optional POCS self-distillation term with adaptive eps
    (main_pocs.py:180-195). NOTE the reference's ``eps.detach()`` at
    main_pocs.py:190 is a no-op (the detached copy is discarded), which
    makes the adaptive-eps regulariser contribute exactly zero gradient;
    we apply ``stop_gradient`` to eps, i.e. the published intent.
  * SNR / Pearson metrics vs the full target each iteration (main.py:166-167)
  * best-loss output tracking with ``<=`` (main.py:173-182)
  * ReduceLROnPlateau semantics (rel threshold, factor, patience;
    main.py:201-204) as pure carry arithmetic
  * EarlyStopping with percentage min-delta + NaN abort
    (utils/torch.py:216-275) — realised as a ``done`` flag; the host driver
    breaks out between chunks.

Early stopping, plateau LR and epoch-count truncation are all expressed as
``done``-masked updates so the same compiled program serves every chunk, and
the same step function vmaps/shard_maps over a batch of patches (see
``deep_prior_interpolation_tpu.parallel``).
"""
from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import get_net, init_weights
from ..ops import conv_vjp
from ..ops import losses as L
from ..ops.noise import build_forgetting_data, data_forgetting_weights, get_noise
from ..ops.pocs import fk_projection
from .history import History, HistoryPOCS, HistoryReg

# module-level so the final POCS projection compiles once per process,
# not once per solve (remote compiles through the axon relay are slow)
_fk_projection_jit = jax.jit(fk_projection)


# ----------------------------------------------------------------------
# static step settings (hashable; part of the jit cache key)
# ----------------------------------------------------------------------

@dataclass(frozen=True)
class StepSettings:
    """STATIC step structure — part of the jit cache key. Keep this minimal:
    anything that can be a traced scalar lives in the ``hyper`` dict built by
    :func:`build_hyper` instead, so changing epochs / LR schedule / early-stop
    thresholds does NOT trigger a recompile (compiles of the big 3D scan body
    cost minutes through the remote-compile path)."""
    loss: str = "mae"
    reg_noise_std: float = 0.03
    param_noise: bool = False
    dropout: float = 0.0
    forget_factor: int = 0
    pocs: bool = False
    pocs_adaptive: bool = True  # eps = main/reg vs fixed pocs_weight
    # reference-as-executed adaptive eps: main_pocs.py:190's ``eps.detach()``
    # discards its result, so eps stays attached and eps*reg == main
    # IDENTICALLY as a function -> the regulariser contributes zero extra
    # gradient direction (total = 2*main). Kept as an A/B mode so the
    # intent-fix (stop_gradient, the default) is quantifiable.
    pocs_eps_attached: bool = False
    track_last: bool = False
    takes_mask: bool = False  # partial-conv nets take (x, mask)
    opt_input: bool = False  # jointly optimise the input noise
    orig_spatial: Tuple[int, ...] = ()
    # virtual input: regenerate the fixed noise canvas from its PRNG key
    # every iteration instead of storing it — saves inputdepth x volume HBM
    # (~0.5 GB at the flagship 3D shape) for one extra RNG draw per step.
    # Only valid when the canvas is raw noise (no wavelet/low-pass shaping,
    # no input optimisation).
    virtual_input: bool = False
    noise_dist: str = "n"
    noise_std: float = 0.1
    input_shape: Tuple[int, ...] = ()
    input_dtype: str = "float32"
    # Pallas fused masked-loss + SNR/pcorr kernel (one HBM pass instead of
    # three); interpret mode off-TPU so the same step runs on the CPU mesh
    fused_loss: bool = False
    fused_interpret: bool = False
    # conv formulation for every conv traced into this step: "conv" (XLA's
    # conv emitters) or "tapmm" (each kernel tap as one matmul — the fast
    # path for vmapped per-patch weights, docs/PERF.md r4 study). A
    # StepSettings field so it participates in the solver's jit cache key
    # instead of living in process-global trace state.
    conv_mode: str = "conv"

    @classmethod
    def from_config(cls, cfg: Config, orig_spatial: Tuple[int, ...],
                    track_last: bool = False,
                    takes_mask: bool = False,
                    input_shape: Tuple[int, ...] = ()) -> "StepSettings":
        opt_input = "input" in cfg.opt_over.split(",")
        shaped = (cfg.filter_noise_with_wavelet
                  or (cfg.lowpass_fs and cfg.lowpass_fc)
                  or cfg.data_forgetting_factor)
        return cls(loss=cfg.loss,
                   reg_noise_std=cfg.reg_noise_std,
                   param_noise=cfg.param_noise, dropout=cfg.dropout,
                   forget_factor=cfg.data_forgetting_factor,
                   pocs=cfg.pocs, pocs_adaptive=cfg.pocs_weight is None,
                   pocs_eps_attached=cfg.pocs_eps_mode == "attached",
                   track_last=track_last,
                   takes_mask=takes_mask,
                   opt_input=opt_input,
                   virtual_input=(cfg.virtual_input and not opt_input
                                  and not shaped),
                   noise_dist=cfg.noise_dist, noise_std=cfg.noise_std,
                   input_shape=tuple(input_shape),
                   input_dtype=cfg.dtype,
                   fused_loss=(cfg.fused_loss
                               and cfg.loss in ("mae", "l1", "mse")),
                   # the axon relay registers platform name "axon", not
                   # "tpu" — it IS a TPU (Mosaic lowers through its remote
                   # compile); only true host backends need interpret mode
                   fused_interpret=jax.default_backend()
                   not in ("tpu", "axon"),
                   conv_mode=("tapmm" if cfg.vmap_conv_mode == "tapmm"
                              else "conv"),
                   orig_spatial=tuple(orig_spatial))


def build_hyper(cfg: Config) -> Dict[str, jnp.ndarray]:
    """Traced scalar hyperparameters of the step (see StepSettings note)."""
    return {
        "epochs": jnp.asarray(cfg.epochs, jnp.int32),
        "reduce_lr": jnp.asarray(bool(cfg.reduce_lr)),
        "lr_factor": jnp.asarray(cfg.lr_factor, jnp.float32),
        "lr_thresh": jnp.asarray(cfg.lr_thresh, jnp.float32),
        "lr_patience": jnp.asarray(cfg.lr_patience, jnp.int32),
        "es_patience": jnp.asarray(int(cfg.earlystop_patience or cfg.epochs),
                                   jnp.int32),
        "es_min_delta": jnp.asarray(cfg.earlystop_min_delta, jnp.float32),
        "pocs_thresh": jnp.asarray(cfg.pocs_thresh, jnp.float32),
        "pocs_weight": jnp.asarray(cfg.pocs_weight if cfg.pocs_weight
                                   is not None else 0.0, jnp.float32),
    }


def _crop_center(x: jnp.ndarray, spatial: Tuple[int, ...]) -> jnp.ndarray:
    """Crop a batched channels-last array back to the unpadded region."""
    slices = [slice(None)]
    for dim, tgt in zip(x.shape[1:-1], spatial):
        d = (dim - tgt) // 2
        slices.append(slice(d, d + tgt))
    slices.append(slice(None))
    return x[tuple(slices)]


def _mask_tree(done, new, old):
    """Pick ``old`` wherever the patch is done (freeze state after stop)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(done, o, n), new, old)


# ----------------------------------------------------------------------
# the scanned step
# ----------------------------------------------------------------------

def make_run_chunk(model, s: StepSettings) -> Callable:
    """Build ``run_chunk(carry, iters, data) -> (carry, ys)``.

    ``data`` holds the per-patch tensors: ``img``/``mask`` (batched
    channels-last, original unpadded spatial size), ``base_input`` (padded
    noise canvas), and optional ``forget_data``/``forget_w``. Pure function —
    jit/vmap/shard_map at will.
    """
    loss_fn = L.get_loss_fn(s.loss)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    def step(data, hyper, carry, it):
        key, k_noise, k_param, k_drop = jax.random.split(carry["key"], 4)
        if s.virtual_input:
            base_shape = s.input_shape
            base_dtype = jnp.dtype(s.input_dtype)
        else:
            base_shape = data["base_input"].shape
            base_dtype = data["base_input"].dtype
        # per-iteration input perturbations — no gradient flows through them
        extra = jnp.zeros(base_shape, base_dtype)
        if s.reg_noise_std > 0:
            extra = extra + s.reg_noise_std * jax.random.normal(
                k_noise, base_shape, extra.dtype)
        if s.forget_factor > 0:
            idx = jnp.minimum(it, s.forget_factor - 1)
            w = jnp.where(it < s.forget_factor, data["forget_w"][idx], 0.0)
            extra = extra + w * data["forget_data"]

        params = carry["params"]  # {"net": ..., optional "input": ...}
        if s.param_noise:
            net_p = params["net"]
            leaves, treedef = jax.tree_util.tree_flatten(net_p)
            pkeys = jax.random.split(k_param, len(leaves))
            leaves = [p + jax.random.normal(k, p.shape, p.dtype) * jnp.std(p) * 0.02
                      if p.ndim >= 4 else p for p, k in zip(leaves, pkeys)]
            params = dict(params,
                          net=jax.tree_util.tree_unflatten(treedef, leaves))

        img, mask = data["img"], data["mask"]
        if s.virtual_input:
            fixed_base = get_noise(data["input_key"], s.input_shape,
                                   s.noise_dist,
                                   jnp.dtype(s.input_dtype)) * s.noise_std
        else:
            fixed_base = None

        def loss_of(p):
            rngs = {"dropout": k_drop} if s.dropout > 0 else None
            if s.opt_input:
                base = p["input"]
            elif s.virtual_input:
                base = fixed_base
            else:
                base = data["base_input"]
            inp = base + extra
            if s.takes_mask:  # partial-conv nets (SURVEY §2.4 #8, fixed here)
                out = model.apply({"params": p["net"]}, inp, data["net_mask"],
                                  rngs=rngs)
            else:
                out = model.apply({"params": p["net"]}, inp, rngs=rngs)
            out = _crop_center(out, s.orig_spatial)
            if s.fused_loss:
                from ..ops.pallas_kernels import fused_loss_metrics
                main, mets = fused_loss_metrics(out, img, mask, loss=s.loss,
                                                interpret=s.fused_interpret)
                fmets = (mets["snr"], mets["pcorr"])
            else:
                main = loss_fn(out, img, mask)
                fmets = ()
            if s.pocs:
                proj, th = fk_projection(out, data["pocs_wdata"],
                                         data["pocs_wmask"],
                                         hyper["pocs_thresh"],
                                         return_threshold=True)
                proj = jax.lax.stop_gradient(proj)
                reg = L.mse(out, proj)
                if s.pocs_adaptive:
                    eps = main / reg
                    if not s.pocs_eps_attached:
                        eps = jax.lax.stop_gradient(eps)
                else:
                    eps = hyper["pocs_weight"].astype(main.dtype)
                total = main + eps * reg
            else:
                reg = jnp.zeros_like(main)
                eps = jnp.zeros_like(main)
                th = jnp.zeros_like(main)
                total = main
            return total, (out, main, reg, eps, th, fmets)

        (loss, (out, main, reg, eps, th, fmets)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)

        direction, opt_state = adam.update(grads, carry["opt_state"], params)
        new_params = jax.tree_util.tree_map(
            lambda p, d: p - carry["lr"] * d, params, direction)

        if s.fused_loss:  # metrics came out of the same HBM pass as the loss
            snr_v, pcorr_v = fmets
        else:
            out32 = out.astype(jnp.float32)  # metric sums in f32 (bf16 nets)
            snr_v = L.snr(out32, img)
            pcorr_v = L.pcorr(out32, img)

        done = carry["done"]
        better = (loss <= carry["loss_min"]) & ~done
        out_best = jnp.where(better, out, carry["out_best"])
        loss_min = jnp.where(better, loss, carry["loss_min"])

        # --- ReduceLROnPlateau (torch rel-threshold min mode),
        #     gated by the dynamic reduce_lr flag ---
        lr = carry["lr"]
        active = hyper["reduce_lr"] & ~done
        pb, pbad = carry["plateau_best"], carry["plateau_bad"]
        is_b = loss < pb * (1.0 - hyper["lr_thresh"])
        pb2 = jnp.where(is_b, loss, pb)
        pbad2 = jnp.where(is_b, 0, pbad + 1)
        reduce = pbad2 > hyper["lr_patience"]
        new_lr = lr * hyper["lr_factor"]
        lr2 = jnp.where(reduce & (lr - new_lr > 1e-8), new_lr, lr)
        pbad2 = jnp.where(reduce, 0, pbad2)
        pb = jnp.where(active, pb2, pb)
        pbad = jnp.where(active, pbad2, pbad)
        lr = jnp.where(active, lr2, lr)

        # --- EarlyStopping (percentage min-delta, NaN abort);
        #     patience 0 disables stopping (utils/torch.py:238-240) ---
        eb, ebad = carry["es_best"], carry["es_bad"]
        first = it == 0
        is_b = loss < eb - eb * hyper["es_min_delta"] / 100.0
        eb2 = jnp.where(first, loss, jnp.where(is_b, loss, eb))
        ebad2 = jnp.where(first | is_b, 0, ebad + 1)
        stop = (~first & (hyper["es_patience"] > 0)
                & (ebad2 >= hyper["es_patience"]))
        nan_stop = jnp.isnan(loss)
        eb = jnp.where(done, eb, eb2)
        ebad = jnp.where(done, ebad, ebad2)
        new_done = done | stop | nan_stop | (it + 1 >= hyper["epochs"])

        new_carry = {
            "params": _mask_tree(done, new_params, carry["params"]),
            "opt_state": _mask_tree(done, opt_state, carry["opt_state"]),
            "key": key,
            "lr": lr,
            "loss_min": loss_min,
            "out_best": out_best,
            "plateau_best": pb,
            "plateau_bad": pbad,
            "es_best": eb,
            "es_bad": ebad,
            "done": new_done,
        }
        if s.track_last:
            new_carry["out_last"] = jnp.where(done, carry["out_last"], out)

        ys = {"loss": loss, "snr": snr_v, "pcorr": pcorr_v, "lr": carry["lr"],
              "recorded": ~done}
        if s.pocs:
            ys.update({"df": main, "reg": reg, "eps": eps, "th": th})
        return new_carry, ys

    def run_chunk(carry, iters, data, hyper):
        # the context is active exactly while THIS function body traces
        # (cached executables never re-enter it), so the conv formulation
        # follows s.conv_mode — which keys the jit cache — not whatever
        # ambient state another trace left behind
        with conv_vjp.conv_impl(s.conv_mode):
            return jax.lax.scan(partial(step, data, hyper), carry, iters)

    return run_chunk


# ----------------------------------------------------------------------
# carry / data construction helpers (shared with the parallel layer)
# ----------------------------------------------------------------------

def pad_multiple_for(cfg: Config) -> int:
    if cfg.pad_multiple and cfg.pad_multiple > 0:
        return cfg.pad_multiple
    mult = 2 ** (len(cfg.filters) - 1)
    if cfg.phase_space:
        # resolution r phase-blocks to r/2: every phased level needs its
        # spatial dims even (models/mulresunet.py phase assert)
        levels = (len(cfg.filters) if cfg.phase_levels < 0
                  else cfg.phase_levels)
        mult = max(mult, 2 ** min(levels, len(cfg.filters)))
        if cfg.phase_deep_levels > 0:
            # depth-2 level r needs divisibility by 2^(r+2)
            deep = min(cfg.phase_deep_levels, levels, len(cfg.filters))
            mult = max(mult, 2 ** (deep + 1))
    return mult


def padded_spatial(spatial: Tuple[int, ...], mult: int) -> Tuple[int, ...]:
    return tuple(int(math.ceil(d / mult)) * mult for d in spatial)


def init_carry(model, s: StepSettings, cfg: Config, key: jax.Array,
               input_shape: Tuple[int, ...], out_channels: int,
               init_params=None, dtype=jnp.float32,
               base_input: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
    """Fresh solver carry: params (+ chosen init), Adam state, trackers.

    ``init_params`` are NET params (transfer learning). With
    ``opt_over='net,input'`` the optimised pytree also carries the input
    noise canvas (``base_input`` required), matching the reference's
    ``get_params('net,input', ...)`` capability (utils/torch.py:138-162).
    """
    k_init, k_winit, key = jax.random.split(key, 3)
    if init_params is None:
        dummy = jnp.zeros(input_shape, dtype)
        rngs = {"params": k_init, "dropout": k_init}
        if s.takes_mask:
            variables = model.init(rngs, dummy, jnp.ones_like(dummy))
        else:
            variables = model.init(rngs, dummy)
        net_params = variables["params"]
        net_params = init_weights(net_params, k_winit, cfg.inittype, cfg.initgain)
    else:
        net_params = init_params
    params: Dict[str, Any] = {"net": net_params}
    if s.opt_input:
        assert base_input is not None, "opt_over='input' needs base_input"
        params["input"] = base_input
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = adam.init(params)
    out_shape = (input_shape[0],) + tuple(s.orig_spatial) + (out_channels,)
    # best-output tracker matches the net's output dtype (bf16 nets emit
    # bf16); halves the largest carry tensor on the flagship 3D shape
    out_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else dtype
    carry = {
        "params": params,
        "opt_state": opt_state,
        "key": key,
        "lr": jnp.asarray(cfg.lr, jnp.float32),
        "loss_min": jnp.asarray(jnp.inf, jnp.float32),
        "out_best": jnp.zeros(out_shape, out_dtype),
        "plateau_best": jnp.asarray(jnp.inf, jnp.float32),
        "plateau_bad": jnp.asarray(0, jnp.int32),
        "es_best": jnp.asarray(0.0, jnp.float32),
        "es_bad": jnp.asarray(0, jnp.int32),
        "done": jnp.asarray(False),
    }
    if s.track_last:
        carry["out_last"] = jnp.zeros(out_shape, out_dtype)
    return carry


def build_base_input(cfg: Config, key: jax.Array, padded: Tuple[int, ...],
                     dtype=jnp.float32,
                     wavelet: Optional[np.ndarray] = None) -> jnp.ndarray:
    """The fixed input noise canvas (main.py:59-99), shape (1, *padded, D).

    Optional shaping: 1-D wavelet convolution along time (main.py:66-72) and
    4th-order Butterworth low-pass (main.py:74-84), both along the first
    spatial axis. When the net computes in bfloat16 the canvas is stored in
    bfloat16 too — it is the largest single tensor of the 3D workload
    (inputdepth x volume, ~1 GB at the flagship shape in f32) and it feeds
    straight into a bf16 conv.
    """
    if cfg.dtype == "bfloat16":
        dtype = jnp.bfloat16
    noise = get_noise(key, (1,) + tuple(padded) + (cfg.inputdepth,),
                      cfg.noise_dist, dtype)
    inp = noise * cfg.noise_std
    if cfg.filter_noise_with_wavelet and wavelet is not None:
        from ..ops.filters import convolve_kernel_1d
        inp = convolve_kernel_1d(inp, jnp.asarray(wavelet, dtype), axis=1)
    if cfg.lowpass_fs and cfg.lowpass_fc:
        from ..ops.filters import lowpass_butterworth_taps
        from ..ops.filters import convolve_kernel_1d
        from ..utils.generic import nextpow2
        taps = lowpass_butterworth_taps(
            fc=cfg.lowpass_fc, fs=cfg.lowpass_fs, ntaps=cfg.lowpass_ntaps,
            order=4, nfft=2 ** nextpow2(padded[0]))
        inp = convolve_kernel_1d(inp, jnp.asarray(taps, dtype), axis=1)
    return inp


def build_data(cfg: Config, s: StepSettings, img: np.ndarray, mask: np.ndarray,
               base_input: Optional[jnp.ndarray], dtype=jnp.float32,
               input_key: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Assemble the per-patch data dict consumed by ``run_chunk``.

    With ``s.virtual_input`` only the noise PRNG key is stored; the canvas is
    regenerated inside the step (saves inputdepth x volume HBM).
    """
    img_ = jnp.asarray(img, dtype)[None]   # (1, *spatial, C)
    mask_ = jnp.asarray(mask, dtype)[None]
    if s.virtual_input:
        assert input_key is not None
        data = {"img": img_, "mask": mask_, "input_key": input_key}
    else:
        data = {"img": img_, "mask": mask_, "base_input": base_input}
    if s.forget_factor > 0:
        fd = build_forgetting_data(img_ * mask_, cfg.inputdepth)
        fd = fd * (jnp.std(base_input) / jnp.std(fd))
        # place on the padded canvas
        pads = [(0, 0)]
        for dim, tgt in zip(fd.shape[1:-1], base_input.shape[1:-1]):
            d = (tgt - dim) // 2
            pads.append((d, tgt - dim - d))
        pads.append((0, 0))
        data["forget_data"] = jnp.pad(fd, pads)
        data["forget_w"] = jnp.asarray(data_forgetting_weights(s.forget_factor))
    if s.pocs:
        coarse = img_ * mask_
        data["pocs_wdata"] = cfg.pocs_alpha * coarse
        data["pocs_wmask"] = jnp.ones_like(mask_) - cfg.pocs_alpha * mask_
    if s.takes_mask:
        # sampling mask broadcast to the noise depth on the padded canvas
        canvas = base_input.shape if base_input is not None else s.input_shape
        c = mask_.shape[-1]
        reps = -(-cfg.inputdepth // c)
        nm = jnp.tile(mask_, (1,) * (mask_.ndim - 1) + (reps,))[..., :cfg.inputdepth]
        pads = [(0, 0)]
        for dim, tgt in zip(nm.shape[1:-1], canvas[1:-1]):
            d = (tgt - dim) // 2
            pads.append((d, tgt - dim - d))
        pads.append((0, 0))
        data["net_mask"] = jnp.pad(nm, pads)
    return data


def extract_noise_canvas(s: StepSettings, carry, data, base_input,
                         spatial: Tuple[int, ...]) -> np.ndarray:
    """The fixed input canvas as (*spatial, inputdepth) f32 — the 'noise'
    field of the reference run bundle (main.py:234). Regenerated from its
    PRNG key under ``virtual_input``; the optimised canvas under
    ``opt_over='...,input'``."""
    if s.opt_input:
        canvas = carry["params"]["input"]
    elif s.virtual_input:
        canvas = get_noise(data["input_key"], s.input_shape, s.noise_dist,
                           jnp.dtype(s.input_dtype)) * s.noise_std
    else:
        canvas = base_input
    cropped = _crop_center(canvas.astype(jnp.float32), spatial)
    return np.asarray(jax.device_get(cropped)[0], np.float32)


# ----------------------------------------------------------------------
# result container + host driver
# ----------------------------------------------------------------------

@dataclass
class SolveResult:
    out_best: np.ndarray          # (*spatial, C), best-loss network output
    history: History
    params: Any
    elapsed: float
    iters_run: int
    stopped_early: bool
    snapshots: Dict[int, np.ndarray]
    # run-bundle parity fields (main.py:226-235, main_pocs.py:260-270):
    # the fixed input canvas (*spatial, inputdepth) and, for POCS runs, the
    # f-k projection of the best output (*spatial, C)
    noise: Optional[np.ndarray] = None
    pocs: Optional[np.ndarray] = None


class DIPSolver:
    """Single-patch DIP solver (capability parity: main.py Interpolator).

    Usage::

        solver = DIPSolver(cfg, outchannel=1)
        result = solver.solve(img, mask, seed=0)   # img/mask (*spatial, C)
    """

    def __init__(self, cfg: Config, outchannel: int = 1, model=None):
        from ..utils.generic import enable_compile_cache
        enable_compile_cache()
        self.cfg = cfg
        self.outchannel = outchannel
        self.model = model if model is not None else get_net(cfg, outchannel)
        # data/loss stay f32; cfg.dtype=bfloat16 switches the NET's compute
        # dtype (handled inside the model), not the data pipeline
        self.dtype = jnp.float32
        self._jitted: Dict[Any, Callable] = {}

    # -- internals -----------------------------------------------------
    def _get_run_chunk(self, s: StepSettings) -> Callable:
        if s not in self._jitted:
            # DPI_COMPILER_OPTIONS: JSON dict of per-compile XLA options
            # (e.g. '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'). Unlike
            # XLA_FLAGS these travel WITH the compile request, so they
            # reach a remote TPU compiler (the axon relay rejects TPU
            # flags in the client-side XLA_FLAGS parser). Perf-tuning
            # escape hatch; empty (XLA defaults) unless set.
            opts = os.environ.get("DPI_COMPILER_OPTIONS")
            self._jitted[s] = jax.jit(
                make_run_chunk(self.model, s), donate_argnums=0,
                compiler_options=json.loads(opts) if opts else None)
        return self._jitted[s]

    @staticmethod
    def _save_checkpoint(path: str, carry, hist, chunk_idx: int,
                         iters_run: int, epochs: int) -> None:
        from ..io.checkpoint import npz_path, save_solver_state
        path = npz_path(path)
        save_solver_state(path, carry)
        # append host-side history + position into the same npz; 'stopped'
        # records whether the solve had already terminated so resume knows
        # whether re-running steps is legal (only for epoch-budget stops)
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
        arrays["__meta__"] = np.asarray(
            json.dumps({"chunk": chunk_idx, "iters_run": iters_run,
                        "epochs": int(epochs),
                        "stopped": bool(jax.device_get(carry["done"]))}))
        for f in hist.FIELDS:
            arrays[f"__hist_{f}__"] = np.asarray(getattr(hist, f), np.float64)
        np.savez(path, **arrays)

    # -- public --------------------------------------------------------
    def solve(self, img: np.ndarray, mask: np.ndarray, seed: int = 0,
              init_params=None, key: Optional[jax.Array] = None,
              verbose: bool = False,
              checkpoint_path: Optional[str] = None,
              checkpoint_every: int = 0,
              profile_dir: Optional[str] = None,
              spatial_mesh=None, spatial_axis: int = 1) -> SolveResult:
        """Optimise one patch.

        ``checkpoint_path`` + ``checkpoint_every`` (in chunks) enable exact
        mid-optimisation resume: the full carry — params, Adam moments, RNG
        key, best output, scheduler/early-stop counters — plus the host
        history is persisted, and a fresh ``solve`` with the same path picks
        up where it left off (the reference can only restart Adam from saved
        weights, SURVEY §5 checkpoint/resume). ``profile_dir`` captures a
        jax.profiler trace of one steady-state chunk.

        ``spatial_mesh`` shards THIS one patch's activation volumes along
        ``spatial_axis`` (an index into the spatial dims; default 1 = the
        first trace axis) over a 1-D ``Mesh("space")`` — the model-parallel
        mode for volumes/precisions that exceed one chip's HBM (SURVEY §2.2
        TP row; see ``parallel.spatial``). The step function and everything
        else about the solve are unchanged: params replicate, XLA GSPMD
        inserts the conv halo exchanges and statistic/gradient all-reduces.
        """
        import contextlib

        cfg = self.cfg
        assert img.shape == mask.shape, "image and mask shapes must match"
        spatial = tuple(img.shape[:-1])
        mult = pad_multiple_for(cfg)
        padded = padded_spatial(spatial, mult)

        save_every = cfg.save_every
        input_shape = (1,) + padded + (cfg.inputdepth,)
        s = StepSettings.from_config(
            cfg, spatial, track_last=save_every is not None,
            takes_mask=getattr(self.model, "takes_mask", False),
            input_shape=input_shape)
        run_chunk = self._get_run_chunk(s)

        # eager setup arrays must land on the solve's backend: the mesh's
        # for a sharded solve (a CPU mesh under a TPU-default process would
        # otherwise mix backends — the round-1 MULTICHIP failure mode)
        place = (jax.default_device(spatial_mesh.devices.flat[0])
                 if spatial_mesh is not None else contextlib.nullcontext())

        if key is None:
            key = jax.random.PRNGKey(seed)
        k_noise, k_model, key = jax.random.split(key, 3)

        with place:
            if s.virtual_input:
                base_input = None
                data = build_data(cfg, s, img, mask, None, self.dtype,
                                  input_key=k_noise)
            else:
                base_input = build_base_input(cfg, k_noise, padded, self.dtype)
                data = build_data(cfg, s, img, mask, base_input, self.dtype)
            hyper = build_hyper(cfg)
            carry = init_carry(self.model, s, cfg, k_model, input_shape,
                               self.outchannel, init_params, self.dtype,
                               base_input=base_input)
        if spatial_mesh is not None:
            from ..parallel.spatial import shard_solver_state
            data, carry = shard_solver_state(spatial_mesh, spatial_axis,
                                             data, carry)

        chunk = max(1, min(cfg.scan_chunk, cfg.epochs))
        if save_every:
            chunk = math.gcd(chunk, int(save_every)) or 1
        n_chunks = math.ceil(cfg.epochs / chunk)

        hist = HistoryPOCS(cfg.epochs) if s.pocs else History(cfg.epochs)
        snapshots: Dict[int, np.ndarray] = {}
        start = time.time()
        iters_run = 0
        start_chunk = 0
        stopped = False

        # exact mid-optimisation resume
        if checkpoint_path:
            from ..io.checkpoint import npz_path
            checkpoint_path = npz_path(checkpoint_path)
        if checkpoint_path and os.path.exists(checkpoint_path):
            from ..io.checkpoint import load_solver_state
            state = np.load(checkpoint_path, allow_pickle=True)
            with place:
                carry = load_solver_state(checkpoint_path, carry)
            if spatial_mesh is not None:  # reload loses the placement
                from ..parallel.spatial import shard_solver_state
                _, carry = shard_solver_state(spatial_mesh, spatial_axis,
                                              {}, carry)
            meta = json.loads(str(state["__meta__"])) if "__meta__" in state \
                else {}
            start_chunk = int(meta.get("chunk", 0))
            iters_run = int(meta.get("iters_run", 0))
            for f in hist.FIELDS:
                if f"__hist_{f}__" in state:
                    getattr(hist, f).extend(state[f"__hist_{f}__"].tolist())
            # Reset 'done' ONLY when the saved run stopped at its epoch
            # budget and the current budget is larger. Early-stop and
            # NaN-abort states are final: stepping again would (at best)
            # undo the convergence decision and (for NaN) write NaN grads
            # into correctly-frozen params.
            if bool(meta.get("stopped", False)):
                last_nan = bool(hist.loss) and not np.isfinite(hist.loss[-1])
                budget_stop = (iters_run >= int(meta.get("epochs", 0))
                               and not last_nan)
                if budget_stop and cfg.epochs > iters_run:
                    carry["done"] = jnp.zeros_like(carry["done"])
                else:
                    start_chunk = n_chunks  # state is final; skip the loop
                    stopped = iters_run < cfg.epochs
            else:
                carry["done"] = jnp.zeros_like(carry["done"])

        for c in range(start_chunk, n_chunks):
            # host numpy on purpose: the jit places it on the solve's
            # backend (an eager jnp.arange would land on the process
            # default, which differs from a CPU-mesh sharded solve's)
            iters = np.arange(c * chunk, (c + 1) * chunk, dtype=np.int32)
            if profile_dir and c == 1:
                with jax.profiler.trace(profile_dir):
                    carry, ys = run_chunk(carry, iters, data, hyper)
                    jax.block_until_ready(ys["loss"])
            else:
                carry, ys = run_chunk(carry, iters, data, hyper)
            ys = jax.device_get(ys)
            n_rec = int(np.sum(ys["recorded"]))
            n_rec = min(n_rec, cfg.epochs - iters_run)
            hist.extend(ys, n_rec)
            iters_run += n_rec
            if verbose and n_rec:
                print(hist.log_message(iters_run - 1), end="\r")
            end_iter = (c + 1) * chunk
            if save_every and end_iter % save_every == 0 and end_iter < cfg.epochs:
                snapshots[end_iter] = np.asarray(
                    jax.device_get(carry["out_last"])[0], np.float32)
            if checkpoint_path and checkpoint_every and \
                    (c + 1) % checkpoint_every == 0:
                self._save_checkpoint(checkpoint_path, carry, hist,
                                      c + 1, iters_run, cfg.epochs)
            if bool(jax.device_get(carry["done"])):
                stopped = iters_run < cfg.epochs
                break
        elapsed = time.time() - start

        out_best = np.asarray(jax.device_get(carry["out_best"])[0], np.float32)
        with place:
            noise_np = extract_noise_canvas(s, carry, data, base_input,
                                            spatial)
            pocs_np = None
            if s.pocs:
                # jitted: the axon TPU relay cannot execute complex FFT ops
                # EAGERLY (UNIMPLEMENTED); compiled they lower fine
                proj = _fk_projection_jit(jnp.asarray(out_best)[None],
                                          data["pocs_wdata"],
                                          data["pocs_wmask"],
                                          hyper["pocs_thresh"])
                pocs_np = np.asarray(jax.device_get(proj)[0], np.float32)
        return SolveResult(out_best=out_best, history=hist,
                           params=carry["params"]["net"], elapsed=elapsed,
                           iters_run=iters_run, stopped_early=stopped,
                           snapshots=snapshots, noise=noise_np, pocs=pocs_np)
