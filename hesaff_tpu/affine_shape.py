"""Batched Baumberg–Lindeberg iterative affine shape adaptation.

TPU-native redesign of /root/reference/affine.cpp:35-100: the reference
adapts one keypoint at a time with early-exit control flow; here a whole
level's keypoints run as one vmapped, masked 16-iteration loop.  Each
iteration warps a smm_window^2 patch from the *previous* blur level (the
prevBlur callback quirk, pyramid.cpp:203), accumulates the second-moment
matrix under the folded Gaussian mask, applies the det-normalized inverse
square root, and checks the reference's exact divergence/convergence
rules:

  * complex eigenvalues of U          -> drop (affine.cpp:85-86)
  * anisotropy l1/l2 > 6 either way   -> drop (affine.cpp:89-90)
  * 1 - l2/l1 < 0.05 twice in a row   -> converged (affine.cpp:92-97)
  * 16 iterations without converging  -> drop (affine.cpp:99)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops import masks
from hesaff_tpu.ops.batching import chunked_vmap
from hesaff_tpu.ops.linalg import eigenvalues_2x2, inv_sqrt_2x2
from hesaff_tpu.ops.warp import (
    affine_grid,
    extract_window,
    onehot_window_sample,
)


class AffineResult(NamedTuple):
    ok: jnp.ndarray    # (K,) bool — converged
    u11: jnp.ndarray   # (K,) shape matrix U (det == 1)
    u12: jnp.ndarray
    u21: jnp.ndarray
    u22: jnp.ndarray
    iters: jnp.ndarray  # (K,) int32 — iteration index at convergence


def _window_gradient(img: jnp.ndarray):
    """Central differences, one-sided at window edges (affine.cpp:14-33).

    Note: central differences are NOT halved (matches the reference).
    """
    gx = jnp.concatenate(
        [
            (img[:, 1:2] - img[:, 0:1]),
            img[:, 2:] - img[:, :-2],
            (img[:, -1:] - img[:, -2:-1]),
        ],
        axis=1,
    )
    gy = jnp.concatenate(
        [
            (img[1:2, :] - img[0:1, :]),
            img[2:, :] - img[:-2, :],
            (img[-1:, :] - img[-2:-1, :]),
        ],
        axis=0,
    )
    return gx, gy


def _adapt_one(blur_stack, src, x, y, s, pixel_distance,
               cfg: HesaffConfig, mask, sample_window: int):
    """Masked 16-iteration adaptation for a single keypoint.

    blur_stack: (L, H, W) blur levels; src: this keypoint's source level
    index (its detection level minus one — the prevBlur quirk), so a
    whole octave's keypoints adapt in one compacted batch.

    The keypoint's neighbourhood is pulled into a local window ONCE
    (the center never moves across iterations, only U does) and all 16
    iterations sample it gather-free via one-hot matmuls — ~150x faster
    than XLA gathers on TPU.
    """
    win = cfg.smm_window_size
    mask_pixels = float(win * win)
    lx = x / pixel_distance
    ly = y / pixel_distance
    ratio = s / (cfg.initial_sigma * pixel_distance)
    H, W = blur_stack.shape[-2], blur_stack.shape[-1]
    wnd, r0, c0 = extract_window(blur_stack, src, ly, lx, sample_window)

    u11 = jnp.float32(1.0)
    u12 = jnp.float32(0.0)
    u21 = jnp.float32(0.0)
    u22 = jnp.float32(1.0)
    ratio_bef = jnp.float32(0.0)
    alive = jnp.bool_(True)
    converged = jnp.bool_(False)
    conv_iter = jnp.int32(0)
    violated = jnp.bool_(False)

    def body(l, state):
        (u11, u12, u21, u22, ratio_bef, alive, converged, conv_iter,
         violated) = state
        wx, wy = affine_grid(
            win, win, lx, ly,
            u11 * ratio, u12 * ratio, u21 * ratio, u22 * ratio,
        )
        from hesaff_tpu.ops import pallas_affine as _pa

        img, _, oow = onehot_window_sample(
            wnd, r0, c0, wy.reshape(-1), wx.reshape(-1), H, W,
            quantize_x=_pa._TRANSPOSED,
        )
        # a sample inside the image but outside the local window would
        # silently read 0 and diverge from the reference — drop + flag
        # (the static window bound is heuristic; see sample_window_size)
        violated = violated | (alive & oow)
        img = img.reshape(win, win)
        gx, gy = _window_gradient(img)
        a = jnp.sum(gx * gx * mask) / mask_pixels
        b = jnp.sum(gx * gy * mask) / mask_pixels
        c = jnp.sum(gy * gy * mask) / mask_pixels

        ia, ib, ic, il1, il2 = inv_sqrt_2x2(a, b, c)
        ratio_act = 1.0 - il2 / il1

        n11 = ia * u11 + ib * u21
        n12 = ia * u12 + ib * u22
        n21 = ib * u11 + ic * u21
        n22 = ib * u12 + ic * u22

        l1, l2, is_real = eigenvalues_2x2(n11, n12, n21, n22)
        aniso_bad = (~is_real) | (l1 / l2 > cfg.anisotropy_max) | (
            l2 / l1 > cfg.anisotropy_max
        )
        just_conv = (
            (ratio_act < cfg.convergence_threshold)
            & (ratio_bef < cfg.convergence_threshold)
            & ~aniso_bad
        )

        upd = alive
        u11 = jnp.where(upd, n11, u11)
        u12 = jnp.where(upd, n12, u12)
        u21 = jnp.where(upd, n21, u21)
        u22 = jnp.where(upd, n22, u22)
        ratio_bef = jnp.where(upd, ratio_act, ratio_bef)
        conv_iter = jnp.where(alive & just_conv, l, conv_iter)
        converged = converged | (alive & just_conv)
        alive = alive & ~aniso_bad & ~just_conv
        return (u11, u12, u21, u22, ratio_bef, alive, converged, conv_iter,
                violated)

    state = (u11, u12, u21, u22, ratio_bef, alive, converged, conv_iter,
             violated)
    state = jax.lax.fori_loop(0, cfg.max_iterations, body, state)
    u11, u12, u21, u22, _, _, converged, conv_iter, violated = state
    return AffineResult(
        ok=converged & ~violated,
        u11=u11, u12=u12, u21=u21, u22=u22, iters=conv_iter,
    )


def unclamped_window_size(cfg: HesaffConfig) -> int:
    """Formula window side before clamping to the octave size."""
    half = cfg.smm_window_size >> 1
    ratio_max = cfg.sigma_step**cfg.num_scales * math.sqrt(2.0)
    rownorm = math.sqrt(2.0) * cfg.anisotropy_max**0.25
    radius = int(math.ceil(half * ratio_max * rownorm)) + 2
    return ((2 * radius + 7) // 8) * 8  # round up to a lane-friendly size


def sample_window_size(cfg: HesaffConfig, height: int, width: int) -> int:
    """Static sampling-window side for the adaptation of one octave.

    Must cover the 19x19 affine grid for every surviving keypoint:
    grid extent <= half*ratio_max*rownorm(U); ratio_max = step^S*sqrt(2)
    (top level + sub-scale interpolation) and rownorm is bounded by the
    sqrt(2)*sqrt(anisotropy-limit) divergence break (affine.cpp:89).
    Clamped to the octave size (small octaves use the whole image, which
    is exact).
    """
    return max(8, min(unclamped_window_size(cfg), height, width))


def adapt_flat(blur_stacks: jnp.ndarray, img_idx, src_level, x, y, s,
               pixel_distance: float, cfg: HesaffConfig,
               active=None) -> AffineResult:
    """Batched adaptation of cross-image flattened keypoints.

    blur_stacks: (B, L, H, W) blur ladders for the whole image batch;
    img_idx / src_level: (K,) each keypoint's image and sampling level
    (detection level minus one — the prevBlur quirk, pyramid.cpp:203).

    Runs OUTSIDE any vmap so the chunked cond-skip genuinely elides
    padding chunks at runtime (a vmapped lax.cond executes both
    branches and skips nothing).

    On TPU (cfg.use_pallas, window unclamped by the octave size) the
    fused Pallas kernel runs the whole loop with the window resident in
    VMEM — one HBM window read per keypoint instead of per-iteration
    one-hot streams.  Small octaves (window clamp active) keep the XLA
    path: its whole-image window changes the out-of-window semantics.
    """
    B, L, H, W = blur_stacks.shape
    swin = sample_window_size(cfg, H, W)
    from hesaff_tpu.ops.pallas_affine import pallas_window_fits

    if (cfg.use_pallas and jax.default_backend() == "tpu"
            and swin == unclamped_window_size(cfg)
            and pallas_window_fits(cfg, H, W)):
        from hesaff_tpu.ops.pallas_affine import adapt_flat_pallas

        return adapt_flat_pallas(
            blur_stacks, img_idx, src_level, x, y, s,
            pixel_distance, cfg, active=active,
        )
    mask = jnp.asarray(masks.smm_gauss_mask(cfg.smm_window_size))
    pd = jnp.float32(pixel_distance)
    flat = blur_stacks.reshape(B * L, H, W)
    # measured sweet spot on v5e: 512-keypoint chunks (saturates the
    # chip; smaller serializes, larger spills and loses the skip win)
    kc = 512
    return chunked_vmap(
        lambda ii, sl, xx, yy, ss: _adapt_one(
            flat, ii * L + sl, xx, yy, ss, pd, cfg, mask, swin
        ),
        (img_idx, src_level, x, y, s),
        chunk=kc,
        active=active,
    )


def adapt_compacted(blur_stack: jnp.ndarray, src_level, x, y, s,
                    pixel_distance: float, cfg: HesaffConfig,
                    active=None) -> AffineResult:
    """Batched adaptation of one octave's compacted keypoints
    (single-image convenience wrapper around adapt_flat)."""
    return adapt_flat(
        blur_stack[None], jnp.zeros(jnp.shape(x), jnp.int32),
        src_level, x, y, s, pixel_distance, cfg, active=active,
    )


def adapt_level(blur: jnp.ndarray, x, y, s, pixel_distance: float,
                cfg: HesaffConfig) -> AffineResult:
    """Batched adaptation of one level's keypoints against its prevBlur.

    blur: (H, W) — the blur level BELOW the detection level
    (the prevBlur quirk, /root/reference/pyramid.cpp:203).
    """
    src = jnp.zeros(jnp.shape(x), jnp.int32)
    return adapt_compacted(blur[None], src, x, y, s, pixel_distance, cfg)
