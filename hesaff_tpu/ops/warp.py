"""Batched affine bilinear sampling (the shared warp primitive).

TPU-native gather formulation of the reference's scalar sampler
(/root/reference/helpers.cpp:209-244): output is a centered grid
(i, j in [-half, +half]) sampled at
(ofsx + i*a11 + j*a12, ofsy + i*a21 + j*a22); out-of-bounds samples
produce 0 and raise a per-call "touched boundary" flag.  vmap over a
keypoint axis gives the batched patch/SMM-window extraction.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_grid(out_h: int, out_w: int, ofsx, ofsy, a11, a12, a21, a22):
    """Sample coordinates for a centered out_h x out_w affine grid."""
    jj = jnp.arange(out_h, dtype=jnp.float32) - (out_h >> 1)
    ii = jnp.arange(out_w, dtype=jnp.float32) - (out_w >> 1)
    j = jj[:, None]
    i = ii[None, :]
    wx = ofsx + i * a11 + j * a12
    wy = ofsy + i * a21 + j * a22
    return wx, wy


def bilinear_sample(img: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray):
    """Bilinear sample img (H, W) at float coords; OOB -> 0 + flag.

    The valid window matches the reference's "safe bilinear" bound:
    0 <= floor(wx) < W-1 and 0 <= floor(wy) < H-1 (helpers.cpp:213-229).
    Returns (samples, touched) where touched = any OOB sample.
    """
    H, W = img.shape
    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    valid = (x0f >= 0) & (y0f >= 0) & (x0f < W - 1) & (y0f < H - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 2)
    fx = wx - x0f
    fy = wy - y0f
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    val = (1.0 - fy) * ((1.0 - fx) * v00 + fx * v01) + fy * (
        (1.0 - fx) * v10 + fx * v11
    )
    return jnp.where(valid, val, 0.0), jnp.any(~valid)


def bilinear_sample_from(stack: jnp.ndarray, idx, wx: jnp.ndarray,
                         wy: jnp.ndarray):
    """Like bilinear_sample but against one image of a (B, H, W) stack.

    idx: scalar int32 image index (per-keypoint, for cross-batch bucketed
    patch extraction).  Keeps the image batch resident on device instead
    of gathering a per-keypoint image copy.
    """
    H, W = stack.shape[-2], stack.shape[-1]
    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    valid = (x0f >= 0) & (y0f >= 0) & (x0f < W - 1) & (y0f < H - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 2)
    fx = wx - x0f
    fy = wy - y0f
    v00 = stack[idx, y0, x0]
    v01 = stack[idx, y0, x0 + 1]
    v10 = stack[idx, y0 + 1, x0]
    v11 = stack[idx, y0 + 1, x0 + 1]
    val = (1.0 - fy) * ((1.0 - fx) * v00 + fx * v01) + fy * (
        (1.0 - fx) * v10 + fx * v11
    )
    return jnp.where(valid, val, 0.0), jnp.any(~valid)


def affine_sample(img, out_h: int, out_w: int, ofsx, ofsy, a11, a12, a21, a22):
    """Warp: centered affine grid + bilinear sample. Returns (out, touched)."""
    wx, wy = affine_grid(out_h, out_w, ofsx, ofsy, a11, a12, a21, a22)
    return bilinear_sample(img, wx, wy)


def check_borders(h: int, w: int, out_h: int, out_w: int,
                  ofsx, ofsy, a11, a12, a21, a22):
    """Corner-only boundary pre-check; True means "touches boundary".

    Matches interpolateCheckBorders (/root/reference/helpers.cpp:191-207):
    the four corners of the centered output grid, tested against the
    (w-2, h-2) inner window with floor/ceil.
    """
    width = w - 2
    height = h - 2
    half_w = out_w >> 1
    half_h = out_h >> 1
    xs = jnp.asarray([-half_w, -half_w, half_w, half_w], jnp.float32)
    ys = jnp.asarray([-half_h, half_h, -half_h, half_h], jnp.float32)
    imx = ofsx + xs * a11 + ys * a12
    imy = ofsy + xs * a21 + ys * a22
    bad = (
        (jnp.floor(imx) <= 0)
        | (jnp.floor(imy) <= 0)
        | (jnp.ceil(imx) >= width)
        | (jnp.ceil(imy) >= height)
    )
    return jnp.any(bad)
