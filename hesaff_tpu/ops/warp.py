"""Batched affine bilinear sampling (the shared warp primitive).

TPU-native gather formulation of the reference's scalar sampler
(/root/reference/helpers.cpp:209-244): output is a centered grid
(i, j in [-half, +half]) sampled at
(ofsx + i*a11 + j*a12, ofsy + i*a21 + j*a22); out-of-bounds samples
produce 0 and raise a per-call "touched boundary" flag.  vmap over a
keypoint axis gives the batched patch/SMM-window extraction.
"""

from __future__ import annotations

import jax
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


def extract_window(stack: jnp.ndarray, src, cy, cx, win: int):
    """Per-keypoint square window via dynamic_slice (contiguous, cheap).

    stack: (L, H, W); src scalar level; (cy, cx) float center.  Returns
    (window (win, win), r0, c0) with the slice clamped into the image.
    Requires win <= min(H, W) (caller clamps the window size).
    """
    H, W = stack.shape[-2], stack.shape[-1]
    r0 = jnp.clip(cy.astype(jnp.int32) - win // 2, 0, H - win)
    c0 = jnp.clip(cx.astype(jnp.int32) - win // 2, 0, W - win)
    w = jax.lax.dynamic_slice(
        stack, (src, r0, c0), (1, win, win)
    )[0]
    return w, r0, c0


def onehot_window_sample(window: jnp.ndarray, r0, c0, wy: jnp.ndarray,
                         wx: jnp.ndarray, img_h: int, img_w: int,
                         quantize_x: bool = False):
    """Gather-free bilinear sampling against a local window.

    TPU XLA gathers run ~20 Msamples/s (measured) — orders of magnitude
    below the VPU/MXU.  Bilinear interpolation factorizes exactly into
    one-hot matmuls:  val = rowsum((E_y @ window) * E_x)  with E_y, E_x
    holding the two bilinear weights per sample.  Built with compares
    against an iota (VPU) + one MXU matmul; identical arithmetic to the
    direct 4-tap form up to summation order.

    window: (win, win) at origin (r0, c0); wy, wx: (N,) absolute image
    coords.  Samples outside the image produce 0 and raise `touched`
    (reference semantics, helpers.cpp:229-239).  Samples inside the
    image but outside the window also produce 0 — the caller sizes the
    window so this cannot happen for surviving keypoints; the returned
    `out_of_window` flag makes any violation of that sizing bound
    observable (the heuristic singular-value bound in
    affine_shape.sample_window_size is not a hard guarantee).

    Returns (values, touched_image_border, out_of_window).
    """
    win = window.shape[0]
    y0f = jnp.floor(wy)
    x0f = jnp.floor(wx)
    valid = (
        (x0f >= 0) & (y0f >= 0) & (x0f < img_w - 1) & (y0f < img_h - 1)
    )
    fy = wy - y0f
    fx = wx - x0f
    iota = jnp.arange(win, dtype=jnp.float32)
    dy = y0f[:, None] - r0.astype(jnp.float32)
    dx = x0f[:, None] - c0.astype(jnp.float32)
    ey = iota[None, :] - dy
    ex = iota[None, :] - dx
    Ey = jnp.where(ey == 0, 1.0 - fy[:, None],
                   jnp.where(ey == 1, fy[:, None], 0.0))
    Ex = jnp.where(ex == 0, 1.0 - fx[:, None],
                   jnp.where(ex == 1, fx[:, None], 0.0))
    # HIGH precision (bf16x3 on TPU, ~f32 accurate): plain DEFAULT would
    # run single-pass bf16 (~4e-3 relative error on 0..255 pixel values)
    # and break oracle parity on threshold decisions; HIGHEST (bf16x6)
    # costs 2x for no measurable parity gain.
    # quantize_x selects WHICH operand pair rides the quantized matmul:
    # (Ey, window) legacy, or (window, Ex) — matching the transposed
    # Pallas affine kernel's structure so the on-chip parity gate stays
    # bit-tight (the Baumberg tail amplifies any rounding-layout change
    # into an oracle-class ~1e-2 U tail; see pallas_affine module doc)
    if quantize_x:
        # exact one-hot column selection + f32 fractional blend —
        # structurally identical to the transposed Pallas kernel's x
        # side (HIGH's bf16x3 of a 0/1 operand reduces to the same
        # 2-pass window split), keeping the on-chip gate bit-tight
        X0 = (ex == 0).astype(jnp.float32)          # (N, win)
        X1 = (ex == 1).astype(jnp.float32)
        hi = jax.lax.Precision.HIGH
        q0 = jax.lax.dot_general(
            window, X0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        q1 = jax.lax.dot_general(
            window, X1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        q = q0 * (1.0 - fx)[None, :] + q1 * fx[None, :]   # (win, N)
        val = jnp.sum(Ey * q.T, axis=1)
    else:
        t = jnp.dot(Ey, window, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGH)
        val = jnp.sum(t * Ex, axis=1)
    oow = valid & (
        (dy[:, 0] < 0) | (dy[:, 0] > win - 2)
        | (dx[:, 0] < 0) | (dx[:, 0] > win - 2)
    )
    return jnp.where(valid, val, 0.0), jnp.any(~valid), jnp.any(oow)


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
