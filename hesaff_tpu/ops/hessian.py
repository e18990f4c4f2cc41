"""Scale-normalized Determinant-of-Hessian response.

3x3 finite-difference stencil matching the reference's shift-register
convolution (/root/reference/pyramid.cpp:63-114): Lxx/Lyy are second
central differences, Lxy the cross difference / 4, and the output is
(Lxx*Lyy - Lxy^2) * sigma^4 (the norm argument is sigma^2, squared
at pyramid.cpp:76).  The reference leaves a 1-px border uninitialized
(latent UB, never read); we zero it instead (SURVEY.md §5).

Expressed with static slices so XLA fuses it with the blur ladder; the
batched variant evaluates all pyramid levels in one pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def hessian_response(img: jnp.ndarray, norm: float | jnp.ndarray) -> jnp.ndarray:
    """DoH response. img: (..., H, W); norm = sigma^2 (squared internally)."""
    norm2 = jnp.asarray(norm, img.dtype) ** 2
    c = img[..., 1:-1, 1:-1]
    lxx = img[..., 1:-1, :-2] - 2.0 * c + img[..., 1:-1, 2:]
    lyy = img[..., :-2, 1:-1] - 2.0 * c + img[..., 2:, 1:-1]
    lxy = (
        img[..., :-2, 2:]
        - img[..., :-2, :-2]
        + img[..., 2:, :-2]
        - img[..., 2:, 2:]
    ) * 0.25
    interior = (lxx * lyy - lxy * lxy) * norm2
    return jnp.pad(
        interior,
        [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)],
        mode="constant",
    )
