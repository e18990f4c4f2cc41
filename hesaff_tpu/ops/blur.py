"""OpenCV-compatible separable Gaussian blur, TPU-first.

The reference delegates to cv::GaussianBlur with kernel size
odd(int(6*sigma + 1)) and BORDER_REPLICATE (/root/reference/helpers.cpp:283-295).
OpenCV samples the continuous Gaussian at integer offsets and normalizes —
reproduced here exactly (this is the #1 source of end-to-end numeric drift
if mismatched; SURVEY.md §7 hard part 4).

Static-sigma blurs (the pyramid ladder) bake the taps as constants into a
separable XLA convolution — XLA maps these onto the VPU/MXU well.  The
per-keypoint variable-sigma blur used by patch normalization lives in
patches.py (taps computed on device, masked to a static maximum width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def opencv_ksize(sigma: float) -> int:
    """Kernel size rule of gaussianBlur (/root/reference/helpers.cpp:286)."""
    size = int(2.0 * 3.0 * sigma + 1.0)
    if size % 2 == 0:
        size += 1
    return size


def gaussian_taps(sigma: float, ksize: int | None = None) -> np.ndarray:
    """Sampled, normalized Gaussian taps (OpenCV getGaussianKernel semantics)."""
    if ksize is None:
        ksize = opencv_ksize(sigma)
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * float(sigma) * float(sigma)))
    return (k / k.sum()).astype(np.float32)


def _sep_conv(img: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D correlation with replicate padding.

    img: (..., H, W) float32; taps: (k,) float32 (static length).

    Implemented as a weighted sum of shifted slices rather than an XLA
    convolution: TPU lowers f32 convs onto the MXU with reduced-precision
    passes by default, which breaks oracle parity, while shift-and-add
    stays in full f32 on the VPU and fuses into a single
    bandwidth-bound pass per axis.
    """
    k = taps.shape[0]
    r = k // 2
    H, W = img.shape[-2], img.shape[-1]
    nb = img.ndim - 2

    pad = [(0, 0)] * nb + [(r, r), (0, 0)]
    p = jnp.pad(img, pad, mode="edge")
    acc = None
    for i in range(k):
        term = taps[i] * jax.lax.slice_in_dim(p, i, i + H, axis=-2)
        acc = term if acc is None else acc + term

    pad = [(0, 0)] * nb + [(0, 0), (r, r)]
    p = jnp.pad(acc, pad, mode="edge")
    acc = None
    for i in range(k):
        term = taps[i] * jax.lax.slice_in_dim(p, i, i + W, axis=-1)
        acc = term if acc is None else acc + term
    return acc


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Blur with a statically-known sigma (pyramid ladder path)."""
    taps = jnp.asarray(gaussian_taps(sigma))
    return _sep_conv(img, taps)


def gaussian_blur_traced(img: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Blur with caller-provided taps (for use inside larger jitted fns)."""
    return _sep_conv(img, taps)
