"""Optimisation engine: the chunked-scan DIP solver, histories, optimizers."""
from .history import History, HistoryReg
from .optimizers import psgld, sgld
from .solver import (DIPSolver, SolveResult, StepSettings, build_base_input,
                     build_data, build_hyper, init_carry, make_run_chunk,
                     pad_multiple_for, padded_spatial)

__all__ = [
    "History", "HistoryReg", "DIPSolver", "SolveResult", "StepSettings",
    "build_base_input", "build_data", "build_hyper", "init_carry",
    "make_run_chunk", "pad_multiple_for", "padded_spatial", "psgld", "sgld",
]
