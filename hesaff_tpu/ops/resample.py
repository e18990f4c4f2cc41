"""Pyramid resampling: strided half-size and bilinear double-size.

Matches /root/reference/helpers.cpp:297-339: halfImage takes every second
pixel with NO prefilter (the level passed in is already blurred to 2*sigma0);
doubleImage is midpoint bilinear.  The reference leaves its last output
row/column pair partially uninitialized (Mat ctor without fill,
helpers.cpp:299) — we define deterministic replicate-edge semantics there
instead (SURVEY.md §5: do not reproduce latent UB).
"""

from __future__ import annotations

import jax.numpy as jnp


def half_image(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H//2, W//2) by taking even-index pixels."""
    H, W = img.shape[-2], img.shape[-1]
    return img[..., 0 : (H // 2) * 2 : 2, 0 : (W // 2) * 2 : 2]


def double_image(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., 2H, 2W) midpoint bilinear upsample."""
    H, W = img.shape[-2], img.shape[-1]
    right = jnp.concatenate([img[..., :, 1:], img[..., :, -1:]], axis=-1)
    down = jnp.concatenate([img[..., 1:, :], img[..., -1:, :]], axis=-2)
    down_right = jnp.concatenate([down[..., :, 1:], down[..., :, -1:]], axis=-1)

    out = jnp.zeros(img.shape[:-2] + (2 * H, 2 * W), img.dtype)
    out = out.at[..., 0::2, 0::2].set(img)
    out = out.at[..., 1::2, 0::2].set(0.5 * (img + down))
    out = out.at[..., 0::2, 1::2].set(0.5 * (img + right))
    out = out.at[..., 1::2, 1::2].set(0.25 * (img + right + down + down_right))
    return out
