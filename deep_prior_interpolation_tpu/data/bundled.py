"""Bundled datasets shipped with the package.

The reference ships ``datasets/lines/{original,random66,less_steep}.npy``
(SURVEY §2.1 #23); the same files are vendored under
``deep_prior_interpolation_tpu/datasets`` so tests, examples and the golden
parity scripts run without the read-only reference checkout mounted.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_DATASETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "datasets")


def dataset_path(relpath: str) -> str:
    """Absolute path of a bundled dataset file, e.g. ``lines/original.npy``."""
    path = os.path.join(_DATASETS_DIR, relpath)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no bundled dataset file {relpath!r} "
                                f"(looked in {_DATASETS_DIR})")
    return path


def lines_dataset(dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """The lines 2D gather (170, 100, 1) and its 66%-decimation mask."""
    img = np.load(dataset_path("lines/original.npy"))
    mask = np.load(dataset_path("lines/random66.npy"))
    return np.asarray(img, dtype), np.asarray(mask, dtype)


def lines_wavelet() -> Tuple[np.ndarray, float, float]:
    """The ``less_steep.npy`` bundle: (data, dt, dx)."""
    d = np.load(dataset_path("lines/less_steep.npy"), allow_pickle=True).item()
    return np.asarray(d["data"]), float(d["dt"]), float(d["dx"])
