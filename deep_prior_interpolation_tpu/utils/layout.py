"""Array layout converters.

Capability parity with the reference's np<->torch glue
(utils/torch.py:109-135: ``np_to_torch``/``torch_to_np``/
``batch_channel_add``/``batch_channel_del``) for a channels-last framework:
helpers to move between the reference's NCHW/NCDHW convention and our
(*spatial, C) convention, and to add/strip batch+channel singleton dims.
"""
from __future__ import annotations

import numpy as np


def to_channels_last(x: np.ndarray) -> np.ndarray:
    """(C, *spatial) -> (*spatial, C) (the reference's load_data transpose,
    main.py:131-135, inverted)."""
    return np.moveaxis(x, 0, -1)


def to_channels_first(x: np.ndarray) -> np.ndarray:
    """(*spatial, C) -> (C, *spatial)."""
    return np.moveaxis(x, -1, 0)


def batch_channel_add(x: np.ndarray) -> np.ndarray:
    """(*spatial,) -> (1, *spatial, 1) (utils/torch.py:130-131 analogue)."""
    return x[None, ..., None]


def batch_channel_del(x: np.ndarray) -> np.ndarray:
    """(1, *spatial, 1) -> (*spatial,) (utils/torch.py:134-135 analogue)."""
    return np.squeeze(np.squeeze(x, axis=0), axis=-1)


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    """Batched channels-first -> channels-last (any spatial rank)."""
    return np.moveaxis(x, 1, -1)


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    """Batched channels-last -> channels-first (any spatial rank)."""
    return np.moveaxis(x, -1, 1)
