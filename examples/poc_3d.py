"""Proof-of-concept 3D run — the reference ``proof_of_concept_3D.ipynb``
config (cell 4): hyperbolic3d patch (256,128,128,1), MulResUnet3D,
inputdepth 64, gain 40, trilinear upsample, L1, 3000 epochs.

The hyperbolic3d dataset is absent from the reference tree
(.MISSING_LARGE_BLOBS, SURVEY §2.1 #23) so a synthetic volume with
hyperbolic events of the same shape is generated, with 66% trace
decimation (random66 geometry).

Usage: python examples/poc_3d.py [epochs] [nt nx ny]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import deep_prior_interpolation_tpu as dpi
from deep_prior_interpolation_tpu.cli import run
from deep_prior_interpolation_tpu.io import show_results
from bench import synth_hyperbolic

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
NT, NX, NY = (int(v) for v in sys.argv[2:5]) if len(sys.argv) > 4 else (256, 128, 128)

vol = synth_hyperbolic(NT, NX, NY)
rng = np.random.RandomState(1)
mask = np.repeat((rng.rand(1, NX, NY) > 0.66).astype(np.float32), NT, 0)

cfg = dpi.Config(
    imgdir=".", outdir="poc_3d", datadim="3d", gain=40.0, epochs=EPOCHS,
    loss="mae", lr=1e-3, inputdepth=64, upsample="linear",
    reg_noise_std=0.03, noise_std=0.1, savemodel=True,
    dtype="bfloat16", remat=False,      # bench r3 defaults: phase-space +
    phase_space=True, phase_levels=3,   # bf16 fit the backward in HBM,
    scan_chunk=25)                      # 500.9 s/1000 iters on v5e-1

outpath = run(cfg, results_root="./results", original=vol, corrupted=mask)
outputs, summary = show_results(outpath, curves=1, savefig=True, original=vol)
print(f"\nfinal SNR {summary['snr']:.2f} dB, PCORR {summary['pcorr']*100:.2f}%"
      f"  (reference notebook: +16.69 dB / 98.93% in 1h52m on V100)")
