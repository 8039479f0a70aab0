"""Data pipeline: N-D patch tiling, overlap-add, 2.5D transposes."""
from .bundled import dataset_path, lines_dataset, lines_wavelet
from .patcher import (PatchExtractor, cosinetaper, count_patches,
                      flat_index_map, hanningtaper, in_content_cropped_shape,
                      mid_intensity_high_texture, overlap_add,
                      patch_array_shape, taper2d, taper3d)
from .pipeline import (extract_patches, get_patch_extractor,
                       reconstruct_patches, transpose_patches_25d)
from .synthetic import decimated_pair, hyperbolic_events, source_wavelet

__all__ = [
    "PatchExtractor", "cosinetaper", "count_patches", "flat_index_map",
    "hanningtaper", "in_content_cropped_shape", "mid_intensity_high_texture",
    "overlap_add", "patch_array_shape", "taper2d", "taper3d",
    "extract_patches", "get_patch_extractor", "reconstruct_patches",
    "transpose_patches_25d", "decimated_pair", "hyperbolic_events",
    "source_wavelet", "dataset_path", "lines_dataset", "lines_wavelet",
]
