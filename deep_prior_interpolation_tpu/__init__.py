"""deep_prior_interpolation_tpu — TPU-native deep-prior seismic interpolation.

A brand-new JAX/XLA/Pallas framework with the capabilities of
polimi-ispl/deep_prior_interpolation (reference at /root/reference): per-patch
"Deep Image Prior" optimisation of randomly initialised CNNs against masked
seismic volumes, with FFT-POCS regularisation, N-D patch tiling/overlap-add,
a 2D/3D network zoo, and patch-parallel execution over TPU meshes.

Typical use::

    import deep_prior_interpolation_tpu as dpi
    cfg = dpi.Config(datadim="2d", epochs=3000, loss="mae", gain=1.0)
    solver = dpi.DIPSolver(cfg, outchannel=1)
    result = solver.solve(img, mask, seed=0)     # img/mask: (*spatial, C)
"""
from .config import Config, net_args_are_same, parse_arguments, read_args, write_args
from .engine import DIPSolver, History, HistoryReg, SolveResult
from .models import get_net, init_weights

__version__ = "0.1.0"

__all__ = [
    "Config", "net_args_are_same", "parse_arguments", "read_args",
    "write_args", "DIPSolver", "History", "HistoryReg", "SolveResult",
    "get_net", "init_weights", "__version__",
]
