"""Precomputed Gaussian weighting masks (host-side numpy constants).

These are tiny fixed tables baked into the compiled program, matching
/root/reference/helpers.cpp:104-147.
"""

from __future__ import annotations

import numpy as np


def smm_gauss_mask(size: int) -> np.ndarray:
    """Square second-moment-matrix mask with truncation-fold correction.

    Reproduces computeGaussMask (/root/reference/helpers.cpp:104-129):
    sigma = halfSize/3, unnormalized separable exp, with the tail mass
    beyond the window folded back onto the outermost rows/cols.
    """
    half = size >> 1
    scale = half / 3.0
    scale2 = -2.0 * scale * scale
    tmp = np.exp(np.arange(half + 1, dtype=np.float64) ** 2 / scale2).astype(
        np.float32
    )
    end = int(np.ceil(scale * 5.0) - half)
    for i in range(1, end):
        tmp[half - i] += np.float32(np.exp((i + half) ** 2 / scale2))
    mask = np.zeros((size, size), np.float32)
    for i in range(half + 1):
        for j in range(half + 1):
            v = tmp[i] * tmp[j]
            mask[half + i, half - j] = v
            mask[half - i, half + j] = v
            mask[half + i, half + j] = v
            mask[half - i, half - j] = v
    return mask


def circular_gauss_mask(size: int) -> np.ndarray:
    """Circular SIFT weighting mask: sigma^2 = 0.9 r^2, zero outside radius.

    Reproduces computeCircularGaussMask (/root/reference/helpers.cpp:131-147).
    Also serves as the binary support mask for photometric normalization
    (mask > 0 inside the disc).
    """
    half = size >> 1
    r2 = float(half * half)
    sigma2 = 0.9 * r2
    yy, xx = np.mgrid[0:size, 0:size]
    disq = (yy - half) ** 2.0 + (xx - half) ** 2.0
    return np.where(disq < r2, np.exp(-disq / sigma2), 0.0).astype(np.float32)


def sift_spatial_bins(patch_size: int, spatial_bins: int):
    """Per-pixel spatial bin indices/weights for SIFT binning.

    Reproduces precomputeBinsAndWeights (/root/reference/siftdesc.cpp:18-49)
    but returns a dense (patch_size, spatial_bins) weight matrix W with
    W[i, b] = total weight of pixel i into spatial bin b — the matrix form
    turns the descriptor accumulation into two MXU matmuls.
    """
    half = patch_size >> 1
    step = (spatial_bins + 1) / (2 * half)
    W = np.zeros((patch_size, spatial_bins), np.float32)
    for i in range(patch_size):
        x = step * i
        xi = int(x)
        b0, b1 = xi - 1, xi
        w1 = np.float32(x - xi)
        w0 = np.float32(1.0 - w1)
        if 0 <= b0 < spatial_bins:
            W[i, b0] += w0
        if 0 <= b1 < spatial_bins:
            W[i, b1] += w1
    return W
