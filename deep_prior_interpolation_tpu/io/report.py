"""Post-run reports: re-assemble a run's patches and plot metric curves.

Capability parity with /root/reference/utils/results.py:19-87
(``show_results``): read the run manifest, overlap-add the per-patch outputs,
render the volume/gather and the loss/SNR/pcorr/LR curves, report the final
reconstruction SNR and Pearson correlation against the original volume.
"""
from __future__ import annotations

import os
from pathlib import Path
from random import sample
from typing import Optional

import numpy as np

from ..config import read_args
from ..data import reconstruct_patches
from ..ops import pcorr, snr
from ..utils.plotting import clim, explode_volume, plot_gather


def show_results(res_dir, opts: Optional[dict] = None, curves: int = 0,
                 savefig: bool = False, original: Optional[np.ndarray] = None):
    """Assemble and report a finished run directory; returns
    (outputs, summary dict)."""
    import matplotlib.pyplot as plt

    res_dir = Path(res_dir)
    cfg = read_args(str(res_dir / "args.txt"))

    if original is None:
        original = np.load(os.path.join(cfg.imgdir, cfg.imgname),
                           allow_pickle=True)
    inputs = np.asarray(original, np.float32)

    if opts is None:
        opts = dict()
    opts.setdefault("clipval", clim(inputs, 98))
    save_opts = opts.pop("save_opts",
                         {"format": "png", "dpi": 150, "bbox_inches": "tight"})

    outputs, hist = reconstruct_patches(cfg, results_dir=str(res_dir),
                                        return_history=True, original=inputs)
    if outputs.shape != inputs.shape:  # stride-cropped extent (results.py:34-37)
        inputs = inputs[tuple(slice(0, s) for s in outputs.shape)]

    # volume / gather rendering
    if outputs.ndim == 3:
        fig = explode_volume(
            outputs, filename=str(res_dir / "output") if savefig else None,
            save_opts=save_opts if savefig else None, **opts)
    else:
        fig = plot_gather(
            outputs, filename=str(res_dir / "output.png") if savefig else None,
            **{k: v for k, v in opts.items() if k in
               ("figsize", "cmap", "clipval", "p", "tlim", "xlim", "labels")})

    summary = {"snr": float(snr(outputs, inputs)),
               "pcorr": float(pcorr(outputs, inputs)),
               "n_patches": len(hist)}

    if curves > 0 and hist:
        idx = sorted(sample(range(len(hist)), curves)) \
            if len(hist) > curves else range(len(hist))
        fig, axs = plt.subplots(1, 4, figsize=(18, 4))
        for i in idx:
            h = hist[i]
            axs[0].plot(h["loss"], label=f"patch {i}")
            axs[1].plot(h["snr"], label=f"patch {i}")
            axs[2].plot(h["pcorr"], label=f"patch {i}")
            if "lr" in h:
                axs[3].plot(h["lr"], label=f"patch {i}")
        axs[0].set_title(f"LOSS {cfg.loss}")
        axs[1].set_title("SNR = %.2f dB" % summary["snr"])
        axs[2].set_title("PCORR = %.2f %%" % (summary["pcorr"] * 100))
        axs[3].set_title("Learning Rate")
        for a in axs:
            a.legend()
            a.set_xlim(0, cfg.epochs)
            a.grid()
        axs[0].set_ylim(0)
        axs[2].set_ylim(0, 1)
        axs[3].set_ylim(0, cfg.lr * 10)
        plt.suptitle(str(res_dir))
        plt.tight_layout(pad=0.5)
        if savefig:
            fig.savefig(res_dir / f"curves.{save_opts['format']}", **save_opts)

    return outputs, summary
