"""Run manifests, checkpoints, result bundles."""
from .checkpoint import (load_checked, load_params, load_solver_state,
                         save_params, save_solver_state)
from .results import (completed_patches, create_run_folder, device_name,
                      load_run, run_bundle_path, save_run)
from .report import show_results

__all__ = [
    "load_checked", "load_params", "load_solver_state", "save_params",
    "save_solver_state", "completed_patches", "create_run_folder",
    "device_name", "load_run", "run_bundle_path", "save_run", "show_results",
]
