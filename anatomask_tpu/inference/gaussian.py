"""Gaussian importance map for sliding-window blending.

Capability parity: /root/reference/nnunetv2/inference/sliding_window_prediction.py:10-29
(sigma = tile_size/8, centered impulse blurred, normalized to max=value_scaling,
zeros replaced by the smallest nonzero value). Computed once per tile size on
host (scipy) and cached; uploaded to device by the caller.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple, Union

import numpy as np
from scipy.ndimage import gaussian_filter


@lru_cache(maxsize=8)
def compute_gaussian(
    tile_size: Tuple[int, ...],
    sigma_scale: float = 1.0 / 8,
    value_scaling_factor: float = 1.0,
    dtype=np.float32,
) -> np.ndarray:
    tmp = np.zeros(tile_size)
    center = tuple(i // 2 for i in tile_size)
    sigmas = [i * sigma_scale for i in tile_size]
    tmp[center] = 1
    gauss = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    gauss = gauss / gauss.max() * value_scaling_factor
    gauss = gauss.astype(dtype)
    mask = gauss == 0
    if mask.any():
        gauss[mask] = gauss[~mask].min()
    return gauss
