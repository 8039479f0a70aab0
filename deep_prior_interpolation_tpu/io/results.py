"""Per-patch run bundles and run folders.

Capability parity with the reference result protocol: the per-patch
``<name>_run.npy`` dict {device, elapsed, outpath, history, mask, image,
output, noise} (main.py:222-235; POCS adds 'pocs', main_pocs.py:260-270) and
versioned run folders (utils/results.py:90-107). Bundles are ``.npz`` (no
pickled class instances — histories are plain dicts), which also makes the
implicit crash-resume story explicit: finished patches are detected by file
presence and skipped.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..engine.history import History
from ..utils.generic import sec2time


def device_name() -> str:
    """Readable accelerator name (parity: utils/torch.py get_gpu_name)."""
    d = jax.devices()[0]
    return f"{d.device_kind} ({d.id})"


def run_bundle_path(outpath: str, name: str) -> str:
    return os.path.join(outpath, f"{name}_run.npz")


def save_run(outpath: str, name: str, history: History, mask: np.ndarray,
             image: np.ndarray, output: np.ndarray, elapsed: float,
             noise: Optional[np.ndarray] = None,
             pocs: Optional[np.ndarray] = None) -> str:
    os.makedirs(outpath, exist_ok=True)
    payload = {
        "device": device_name(),
        "elapsed": sec2time(elapsed),
        "elapsed_seconds": float(elapsed),
        "outpath": outpath,
        "history": np.asarray(history.as_dict(), dtype=object),
        "mask": mask,
        "image": image,
        "output": output,
    }
    if noise is not None:
        payload["noise"] = noise
    if pocs is not None:
        payload["pocs"] = pocs
    path = run_bundle_path(outpath, name)
    np.savez(path, **payload)
    return path


def load_run(path: str) -> Dict:
    with np.load(path, allow_pickle=True) as z:
        out = {k: z[k] for k in z.files}
    if "history" in out:
        out["history"] = out["history"].item()
    return out


def completed_patches(outpath: str) -> List[str]:
    """Names of patches with a finished bundle (idempotent resume)."""
    if not os.path.isdir(outpath):
        return []
    return sorted(f[:-len("_run.npz")] for f in os.listdir(outpath)
                  if f.endswith("_run.npz"))


def create_run_folder(root: str, name: str) -> str:
    """Versioned run dir <root>/<name>, <name>_1, ... (utils/results.py:90-107)."""
    path = os.path.join(root, name)
    i = 0
    while os.path.exists(path):
        i += 1
        path = os.path.join(root, f"{name}_{i}")
    os.makedirs(path)
    return path
