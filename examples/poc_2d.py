"""Proof-of-concept 2D run — the reference ``proof_of_concept_2D.ipynb``
config (cell 4) as a script: lines 170x100 gather, 66% traces dropped,
MulResUnet 2D, inputdepth 64, L1, Adam 1e-3, gain 1, 3000 epochs.

Usage: python examples/poc_2d.py [epochs]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import deep_prior_interpolation_tpu as dpi
from deep_prior_interpolation_tpu.cli import run
from deep_prior_interpolation_tpu.io import show_results

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

from deep_prior_interpolation_tpu.data import lines_dataset  # noqa: E402
img, mask = lines_dataset()

cfg = dpi.Config(
    imgdir=".", imgname="original.npy", maskname="random66.npy",
    outdir="poc_2d", datadim="2d", gain=1.0, epochs=EPOCHS, loss="mae",
    lr=1e-3, inputdepth=64, upsample="nearest", reg_noise_std=0.03,
    noise_std=0.1, savemodel=True)

outpath = run(cfg, results_root="./results", original=img, corrupted=mask)
outputs, summary = show_results(outpath, curves=1, savefig=True, original=img)
print(f"\nfinal SNR {summary['snr']:.2f} dB, PCORR {summary['pcorr']*100:.2f}%"
      f"  (reference notebook at 3000 epochs: -0.59 dB / 61.46%)")
