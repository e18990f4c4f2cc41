"""Batched 128-D SIFT descriptors via MXU-friendly matmul binning.

TPU-native redesign of /root/reference/siftdesc.cpp: the reference
scatter-adds each pixel into up to 8 of 128 bins (samplePatch,
siftdesc.cpp:51-81).  Scatters are slow on TPU; instead the trilinear
binning factorizes exactly:

    desc[br, bc, o] = sum_{r,c} R[r,br] * C[c,bc] * W[r,c,o]

where R == C is the dense (patch, spatial_bins) spatial-weight matrix
(ops/masks.sift_spatial_bins) and W holds each pixel's mask*magnitude
split over its two orientation bins.  That is two small matmuls per
keypoint — batched over keypoints they land on the MXU.

Pipeline per patch (computeSiftDescriptor, siftdesc.cpp:115-140):
photometric normalization (mask-as-binary support, mean->128, sigma->50,
clamp [0,255]; helpers.cpp:246-281), unhalved central-difference
gradients (one-sided at edges), trilinear binning, L2 normalize, clip at
0.2, conditional renormalize, quantize q = min(int(512 v), 255).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops import masks


def photometric_normalize(patches: jnp.ndarray, support: jnp.ndarray):
    """Normalize to mean 128 / sigma 50 over the binary support disc.

    patches: (K, P, P); support: (P, P) bool. No-op for patches with
    sigma < 1e-4 (helpers.cpp:269-271). Clamps to [0, 255].
    """
    n = jnp.sum(support)
    msk = support[None, :, :]
    mean = jnp.sum(patches * msk, axis=(1, 2), keepdims=True) / n
    var = jnp.sqrt(
        jnp.sum(jnp.where(msk, (mean - patches) ** 2, 0.0), axis=(1, 2),
                keepdims=True) / n
    )
    fac = 50.0 / var
    out = jnp.clip(128.0 + fac * (patches - mean), 0.0, 255.0)
    return jnp.where(var < 0.0001, patches, out)


def patch_gradients(patches: jnp.ndarray):
    """(K,P,P) -> (grad_mag, orientation); unhalved central differences."""
    gx = jnp.concatenate(
        [
            patches[:, :, 1:2] - patches[:, :, 0:1],
            patches[:, :, 2:] - patches[:, :, :-2],
            patches[:, :, -1:] - patches[:, :, -2:-1],
        ],
        axis=2,
    )
    gy = jnp.concatenate(
        [
            patches[:, 1:2, :] - patches[:, 0:1, :],
            patches[:, 2:, :] - patches[:, :-2, :],
            patches[:, -1:, :] - patches[:, -2:-1, :],
        ],
        axis=1,
    )
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    return mag, ori


def _orientation_split(ori, val, n_bins: int):
    """Per-pixel value split across the two neighbouring orientation bins.

    o = n*(ori+2pi)/2pi; bo0 = int(o) % n; bo1 = (bo0+1) % n
    (siftdesc.cpp:64-72). Returns (K, P, P, n) weights.
    """
    o = n_bins * (ori + 2.0 * np.pi) / (2.0 * np.pi)
    bo0 = jnp.floor(o)
    w1 = o - bo0
    b0 = bo0.astype(jnp.int32) % n_bins
    b1 = (b0 + 1) % n_bins
    oh0 = jax.nn.one_hot(b0, n_bins, dtype=val.dtype)
    oh1 = jax.nn.one_hot(b1, n_bins, dtype=val.dtype)
    return val[..., None] * ((1.0 - w1)[..., None] * oh0 + w1[..., None] * oh1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def sift_descriptors(patches: jnp.ndarray, cfg: HesaffConfig):
    """Patches (K, P, P) float32 -> (K, 128) float32 quantized descriptors.

    Output values are the quantized floats the reference stores back into
    vec (siftdesc.cpp:108-112); cast to uint8 for the export contract.
    """
    P = cfg.patch_size
    sb = cfg.spatial_bins
    ob = cfg.orientation_bins
    circ = jnp.asarray(masks.circular_gauss_mask(P))
    spatial = jnp.asarray(masks.sift_spatial_bins(P, sb))  # (P, sb)

    patches = photometric_normalize(patches, circ > 0)
    mag, ori = patch_gradients(patches)
    val = circ[None] * mag
    w = _orientation_split(ori, val, ob)            # (K, P, P, ob)

    # desc[k, br, bc, o] = sum_rc spatial[r,br] spatial[c,bc] w[k,r,c,o]
    t = jnp.einsum("rb,krco->kbco", spatial, w,
                   precision=jax.lax.Precision.HIGHEST)
    desc = jnp.einsum("cd,kbco->kbdo", spatial, t,
                      precision=jax.lax.Precision.HIGHEST)
    desc = desc.reshape(desc.shape[0], sb * sb * ob)

    # L2 normalize -> clip -> conditional renormalize (siftdesc.cpp:98-107)
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    desc = desc / norm
    clipped = jnp.minimum(desc, cfg.max_bin_value)
    changed = jnp.any(desc > cfg.max_bin_value, axis=1, keepdims=True)
    norm2 = jnp.sqrt(jnp.sum(clipped * clipped, axis=1, keepdims=True))
    desc = jnp.where(changed, clipped / norm2, clipped)

    q = jnp.minimum(jnp.floor(512.0 * desc), 255.0)
    return q
