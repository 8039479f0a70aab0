"""Pure jax.numpy op library: losses/metrics, noise, filters, POCS,
linear operators, masks, slopes."""
from .losses import (get_loss_fn, mae, masked_mae, masked_mse, mse, pcorr, snr)
from .noise import build_forgetting_data, data_forgetting_weights, get_noise
from .pocs import POCS, compute_threshold, fk_projection, pocs_fk_fn, threshold
from .filters import (bool2bin, convolve_kernel_1d, denormalize,
                      first_derivative, gaussian_filter, gaussian_kernel,
                      lowpass_butterworth_taps, normalize, ricker_wavelet,
                      second_derivative)
from .linops import (LinearOperator, auto_adjoint, avo_modelling, chain,
                     dottest, hessian, vertical_conv, vertical_grad)
from .masks import MaskUpdate, add_rand_mask, build_mask, dilate_mask
from .slopes import Hale2D, directional_laplacian, structure_tensor_dips

__all__ = [
    "get_loss_fn", "mae", "masked_mae", "masked_mse", "mse", "pcorr", "snr",
    "build_forgetting_data", "data_forgetting_weights", "get_noise",
    "POCS", "compute_threshold", "fk_projection", "pocs_fk_fn", "threshold",
    "bool2bin", "convolve_kernel_1d", "denormalize", "first_derivative",
    "gaussian_filter", "gaussian_kernel", "lowpass_butterworth_taps",
    "normalize", "ricker_wavelet", "second_derivative",
    "LinearOperator", "auto_adjoint", "avo_modelling", "chain", "dottest",
    "hessian", "vertical_conv", "vertical_grad",
    "MaskUpdate", "add_rand_mask", "build_mask", "dilate_mask",
    "Hale2D", "directional_laplacian", "structure_tensor_dips",
]
