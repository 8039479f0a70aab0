"""Host-side optimisation histories.

Capability parity with the reference ring-logs ``History`` / ``HistoryReg``
(/root/reference/utils/metrics.py:47-137), rebuilt as thin numpy containers
filled from device history buffers once per scan chunk (the reference appends
per iteration with a device->host sync each time, main.py:165-168).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..utils.generic import ten_digit


class History:
    """loss / snr / pcorr / lr traces (utils/metrics.py:47-85)."""

    FIELDS = ("loss", "snr", "pcorr", "lr")
    MSG = "Iter %s, Loss = %+.2e, SNR = %+2.2f dB, PCORR = %+.2f %%"

    def __init__(self, epochs: int):
        self.epochs = epochs
        self.zfill = ten_digit(epochs)
        for f in self.FIELDS:
            setattr(self, f, [])

    def extend(self, chunk: Dict[str, np.ndarray], n: int) -> None:
        """Append the first ``n`` entries of each per-chunk device buffer."""
        for f in self.FIELDS:
            getattr(self, f).extend(np.asarray(chunk[f][:n]).tolist())

    def append(self, values) -> None:
        for f, v in zip(self.FIELDS[:len(values)], values):
            getattr(self, f).append(float(v))

    def __len__(self) -> int:
        return len(self.loss)

    def __getitem__(self, item):
        return tuple(getattr(self, f)[item] for f in self.FIELDS if f != "lr")

    def log_message(self, idx: int) -> str:
        return self.MSG % (str(idx + 1).zfill(self.zfill), self.loss[idx],
                           self.snr[idx], self.pcorr[idx] * 100)

    def as_dict(self) -> Dict[str, List[float]]:
        return {f: list(getattr(self, f)) for f in self.FIELDS}


class HistoryReg(History):
    """+ data-fit and regulariser traces (utils/metrics.py:88-137).

    Library surface for externally-regularised workflows (e.g. a slope /
    linear-operator penalty built from ``ops.linops`` / ``ops.slopes``); like
    the reference's HistoryReg it is exported but not instantiated by the
    built-in drivers, which use ``History`` or ``HistoryPOCS``."""

    FIELDS = ("loss", "df", "reg", "snr", "pcorr", "lr")
    MSG = "Iter %s, Loss = %+.2e, DF = %.2e, REG = %.2e, SNR = %+.2f dB, PCORR = %+.2f %%"

    def log_message(self, idx: int) -> str:
        return self.MSG % (str(idx + 1).zfill(self.zfill), self.loss[idx],
                           self.df[idx], self.reg[idx], self.snr[idx],
                           self.pcorr[idx] * 100)


class HistoryPOCS(HistoryReg):
    """+ adaptive-eps and threshold traces (utils/metrics.py:140-192)."""

    FIELDS = ("loss", "df", "reg", "eps", "snr", "pcorr", "th", "lr")
    MSG = ("Iter %s, loss=%.2e, df=%.2e, reg=%.2e, eps=%.2e, SNR=%+.2fdB, "
           "th=%.2e")

    def log_message(self, idx: int) -> str:
        return self.MSG % (str(idx + 1).zfill(self.zfill), self.loss[idx],
                           self.df[idx], self.reg[idx], self.eps[idx],
                           self.snr[idx], self.th[idx])
