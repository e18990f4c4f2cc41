"""Affine patch normalization: batched warp + anti-alias blur + subsample.

TPU-native redesign of AffineShape::normalizeAffine
(/root/reference/affine.cpp:102-144).  The reference allocates a
variable-size workspace per keypoint (patchImageSize depends on scale),
warps at native image resolution, Gaussian-blurs with
sigma = 1.5 * imageToPatchScale, and bilinearly subsamples the center to a
41x41 patch.  Variable shapes are anathema to XLA, so keypoints are
*bucketed by workspace size* (static bucket sizes, a handful of compiled
specializations) and each bucket runs as one batched kernel:

  * the B x B workspace warp clamps its output index to the keypoint's
    true workspace extent W_S = patchImageSize+2, so indices beyond the
    real workspace replicate the edge row/col — which makes the
    subsequent static-size blur's edge padding reproduce OpenCV's
    BORDER_REPLICATE on the *true* W_S x W_S workspace exactly;
  * the per-keypoint blur sigma varies, so taps are computed on device
    into a static maximum width (the bucket's worst case), zero-masked
    beyond each keypoint's true OpenCV kernel size, and renormalized —
    identical semantics to gaussianBlurInplace (helpers.cpp:291-295);
  * the 41x41 subsample is a batched bilinear gather at offsets
    (W_S>>1) + i * imageToPatchScale (affine.cpp:131).

Keypoints whose imageToPatchScale <= 0.4 take the direct-warp branch
(affine.cpp:135-141), selected PER KEYPOINT (its <= cutoff) like the
reference; with default parameters the branch is dead (minimum
patchImageSize ~21 > 0.4*41) and the static `_min_workspace` bound
elides the dual computation entirely, but non-default patch_size /
mr_size / upscale configs route each keypoint to its true branch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.batching import chunked_vmap as _chunked_vmap
from hesaff_tpu.ops.warp import check_borders

# Bucket sizes for the workspace side B >= patchImageSize+2. Geometric-ish
# spacing bounds wasted compute at ~25%; large sizes are rare (keypoint
# counts fall ~4x per octave while S doubles).
BUCKET_SIZES = (
    25, 33, 41, 49, 65, 81, 97, 129, 161, 193, 257, 321, 385, 513,
    641, 769, 1025, 1281, 1537, 2049,
)


def patch_image_size(s: np.ndarray, mr_size: float) -> np.ndarray:
    """patchImageSize = 2*int(ceil(s*mrSize))+1 (affine.cpp:106-108)."""
    mr_scale = np.ceil(np.asarray(s, np.float32) * np.float32(mr_size))
    return (2 * mr_scale.astype(np.int64) + 1).astype(np.int32)


def bucket_for(ws: int) -> int:
    """Smallest bucket size >= ws (workspace side = patchImageSize+2)."""
    for b in BUCKET_SIZES:
        if b >= ws:
            return b
    return -1  # exceeds all buckets -> caller drops + counts


def _max_ksize_for_bucket(bucket: int, patch_size: int,
                          smooth_factor: float) -> int:
    """Static upper bound on the OpenCV blur kernel width in this bucket."""
    its_max = (bucket - 2) / patch_size
    size = int(2.0 * 3.0 * smooth_factor * its_max + 1.0)
    if size % 2 == 0:
        size += 1
    return size


def _device_gauss_taps(sigma, ksize, kmax: int):
    """Per-keypoint sampled-Gaussian taps, masked to `ksize`, normalized.

    sigma, ksize: traced scalars; kmax: static width (odd). Tap i sits at
    offset i - kmax//2; offsets beyond the true radius ksize//2 get zero
    weight, reproducing OpenCV's size-limited sampled kernel.
    """
    rmax = kmax // 2
    off = jnp.arange(-rmax, rmax + 1, dtype=jnp.float32)
    r_true = (ksize // 2).astype(jnp.float32)
    w = jnp.exp(-(off * off) / (2.0 * sigma * sigma))
    w = jnp.where(jnp.abs(off) <= r_true, w, 0.0)
    return w / jnp.sum(w)


def _workspace_window(bucket: int, height: int, width: int):
    """Static per-keypoint window extents covering the workspace warp.

    The rectified frame is lower-triangular with singular values bounded
    by the affine stage's sqrt(anisotropy_max) divergence break
    (sigma1 <= sqrt(6) ~ 2.45): half-extents are (bucket/2)*|a11| <=
    1.23*bucket in x and (bucket/2)*(|a21|+|a22|) <= 1.74*bucket in y,
    plus bilinear-tap and centering margins.
    """
    wy = min(height, ((int(3.5 * bucket) + 15) // 8) * 8)
    wx = min(width, ((int(2.5 * bucket) + 15) // 8) * 8)
    return wy, wx


def _warp_workspace(images, idx, bucket: int, x, y, a11, a12, a21, a22, ws):
    """Clamped-index det-1 workspace warp for one keypoint — gather-free.

    images: (B, H, W) batch; idx: this keypoint's image.  Output index q
    in [0, bucket); effective grid offset uses min(q, ws-1) - (ws>>1) so
    q >= ws replicates the last true row/col (exactly BORDER_REPLICATE
    for the later blur).  Returns (workspace (bucket, bucket), touched)
    where `touched` mirrors the reference's drop-if-any-OOB rule
    (affine.cpp:126-134).

    TPU-first formulation (XLA gathers are ~20 Msamples/s): the
    rectified frame has a12 == 0, so wx depends only on the output
    column — the bilinear warp factorizes EXACTLY into an x-resample
    (one small matmul against a per-keypoint window) followed by a
    per-row one-hot y-resample (scanned, bounded memory):

        xs(y, i)  = sum_x win(y, x) * Ex[i, x]          (MXU)
        out(j, i) = sum_y Ey[j, i, y] * xs(y, i)        (VPU, scan over j)
    """
    H, W = images.shape[-2], images.shape[-1]
    WY, WX = _workspace_window(bucket, H, W)
    half = (ws >> 1).astype(jnp.float32)

    r0 = jnp.clip(y.astype(jnp.int32) - WY // 2, 0, H - WY)
    c0 = jnp.clip(x.astype(jnp.int32) - WX // 2, 0, W - WX)
    win = jax.lax.dynamic_slice(images, (idx, r0, c0), (1, WY, WX))[0]

    q = jnp.arange(bucket, dtype=jnp.int32)
    eff = (jnp.minimum(q, ws - 1).astype(jnp.float32) - half)

    # x-pass: per-column positions, constant across rows
    wx = x + eff * a11                       # (bucket,)
    x0f = jnp.floor(wx)
    fx = wx - x0f
    valid_x = (x0f >= 0) & (x0f < W - 1)
    iota_x = jnp.arange(WX, dtype=jnp.float32)
    dx = iota_x[None, :] - (x0f[:, None] - c0.astype(jnp.float32))
    Ex = jnp.where(dx == 0, 1.0 - fx[:, None],
                   jnp.where(dx == 1, fx[:, None], 0.0))   # (bucket, WX)
    xs = jnp.dot(Ex, win.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGH)  # (bucket, WY)

    # y-pass: scan over output rows; per row the y positions vary by col
    iota_y = jnp.arange(WY, dtype=jnp.float32)

    def row(_, effj):
        wy = y + eff * a21 + effj * a22      # (bucket,)
        y0f = jnp.floor(wy)
        fy = wy - y0f
        valid_y = (y0f >= 0) & (y0f < H - 1)
        dy = iota_y[None, :] - (y0f[:, None] - r0.astype(jnp.float32))
        Ey = jnp.where(dy == 0, 1.0 - fy[:, None],
                       jnp.where(dy == 1, fy[:, None], 0.0))  # (bucket, WY)
        vals = jnp.sum(Ey * xs, axis=1)      # (bucket,)
        ok = valid_x & valid_y
        return None, (jnp.where(ok, vals, 0.0), jnp.any(~ok))

    _, (out, bad) = jax.lax.scan(row, None, eff)
    return out, jnp.any(bad)


def _blur_one(ws_img, taps):
    """Separable shift-and-add blur with edge replication (one keypoint).

    ws_img: (B, B); taps: (kmax,). Edge replication at the buffer
    boundary equals replication at the true workspace boundary because
    the warp already clamped indices beyond ws-1.
    """
    B = ws_img.shape[0]
    kmax = taps.shape[0]
    r = kmax // 2
    p = jnp.pad(ws_img, ((r, r), (0, 0)), mode="edge")
    acc = None
    for i in range(kmax):
        t = taps[i] * jax.lax.slice_in_dim(p, i, i + B, axis=0)
        acc = t if acc is None else acc + t
    p = jnp.pad(acc, ((0, 0), (r, r)), mode="edge")
    acc = None
    for i in range(kmax):
        t = taps[i] * jax.lax.slice_in_dim(p, i, i + B, axis=1)
        acc = t if acc is None else acc + t
    return acc


def _subsample_patch(ws_img, ws, its, patch_size: int):
    """41x41 bilinear subsample from the blurred workspace center.

    Axis-aligned scaling is exactly separable: out = S @ ws_img @ S^T
    with S the (41, bucket) one-hot bilinear selection matrix — two
    small MXU matmuls instead of 1681 gathers.
    """
    B = ws_img.shape[0]
    half = patch_size >> 1
    i = jnp.arange(-half, half + 1, dtype=jnp.float32)
    ofs = (ws >> 1).astype(jnp.float32)
    p = ofs + i * its                       # (41,)
    p0 = jnp.floor(p)
    f = p - p0
    iota = jnp.arange(B, dtype=jnp.float32)
    d = iota[None, :] - p0[:, None]
    S = jnp.where(d == 0, 1.0 - f[:, None],
                  jnp.where(d == 1, f[:, None], 0.0))  # (41, B)
    hi = jax.lax.Precision.HIGH
    t = jnp.dot(S, ws_img, preferred_element_type=jnp.float32, precision=hi)
    return jnp.dot(t, S.T, preferred_element_type=jnp.float32, precision=hi)


def _min_workspace(cfg: HesaffConfig) -> int:
    """Static lower bound on any keypoint's workspace side ws = S + 2.

    The smallest detectable scale is initial_sigma * step (level 1)
    shifted down by the sub-scale interpolation limit 2^(-1.5/3), times
    the smallest pixel distance (0.5 when upscaling).
    """
    pd_min = 0.5 if cfg.upscale_input else 1.0
    s_min = (cfg.initial_sigma * cfg.sigma_step
             * 2.0 ** (-cfg.final_shift_limit / cfg.num_scales) * pd_min)
    return 2 * int(math.ceil(s_min * cfg.mr_size)) + 3


def _direct_warp(images, ii, xx, yy, b11, b21, b22, its, P: int):
    """Direct-warp branch (affine.cpp:135-141): P x P det-1 warp with
    A * imageToPatchScale, no smoothing.  Separable exact formulation
    (_warp_workspace with ws == bucket == P disables the edge clamp)."""
    return _warp_workspace(
        images, ii, P, xx, yy,
        b11 * its, 0.0, b21 * its, b22 * its,
        jnp.full_like(its, P).astype(jnp.int32),
    )


def extract_bucket_batch(images: jnp.ndarray, bucket: int, img_idx,
                         x, y, s, a11, a12, a21, a22, cfg: HesaffConfig,
                         active=None, prev_bucket: int = 0,
                         valid_hw=None):
    """Batched patch extraction for keypoints assigned to one bucket.

    images: (B, H, W); img_idx + remaining array args: (K,) per-keypoint
    (keypoints may come from different images — cross-batch bucketing).
    `active` (K,) bool marks real (non-padding) slots: all-padding
    chunks of the keypoint axis are skipped at runtime.  `prev_bucket`:
    the next-smaller bucket size (keypoints here have ws > prev_bucket),
    used to statically decide whether this bucket can contain
    direct-branch (its <= 0.4) keypoints.
    Returns (patches (K, P, P), ok (K,)).  ok=False for keypoints whose
    patch touches the image boundary (corner pre-check, affine.cpp:112,
    or full-warp check, affine.cpp:126).

    The rectified frame has a12 == 0 (rectify_up_is_up); the separable
    warps rely on it.
    """
    P = cfg.patch_size
    mr_scale = jnp.ceil(s * cfg.mr_size)
    S = 2 * mr_scale.astype(jnp.int32) + 1
    its = S.astype(jnp.float32) / P
    ws = S + 2

    H, W = images.shape[-2], images.shape[-1]
    # valid_hw: traced (B, 2) TRUE image dims when `images` is padded to
    # a shape bucket — the boundary pre-check (affine.cpp:112) must use
    # the true dims so padded-mode patch acceptance matches the
    # unpadded run
    if valid_hw is None:
        hk = jnp.full_like(img_idx, H)
        wk = jnp.full_like(img_idx, W)
    else:
        vhw = jnp.asarray(valid_hw, jnp.int32)
        hk = vhw[img_idx, 0]
        wk = vhw[img_idx, 1]
    corner_bad = jax.vmap(
        lambda hh, ww, itss, b11, b12, b21, b22, xx, yy: check_borders(
            hh, ww, P, P, xx, yy,
            b11 * itss, b12 * itss, b21 * itss, b22 * itss,
        )
    )(hk, wk, its, a11, a12, a21, a22, x, y)

    use_blur_branch = (bucket - 2) / P > cfg.oversample_cutoff
    # can this bucket hold keypoints with its <= cutoff?  its <= cutoff
    # iff ws <= cutoff*P + 2; the bucket holds ws in (prev_bucket, bucket]
    # and ws >= _min_workspace(cfg)
    smallest_ws = max(prev_bucket + 1, _min_workspace(cfg))
    mixed = use_blur_branch and smallest_ws <= cfg.oversample_cutoff * P + 2
    if use_blur_branch:
        kmax = _max_ksize_for_bucket(bucket, P, cfg.patch_smooth_factor)
        WY, _ = _workspace_window(bucket, H, W)
        # chunk the keypoint axis so per-chunk temporaries (one-hot
        # y-pass (chunk, bucket, WY), workspace, blur, subsample) stay
        # within a fixed memory budget; each chunk runs warp -> blur ->
        # subsample end to end and only (chunk, P, P) patches survive
        # chunk sizing: the y-pass streams chunk*bucket*WY one-hot temps
        # per row-step, so total traffic ~ chunk*bucket^2*WY. Large
        # buckets hold few real keypoints — tiny chunks let cond-skip
        # elide nearly all padding; small dense buckets want large
        # chunks for parallelism.
        if bucket > 200:
            kc = 16
        else:
            kc = max(8, min(x.shape[0], (16 << 20) // (bucket * WY)))

        def chunk_fn(ii, xx, yy, b11, b12, b21, b22, w, itss):
            wsp, touched = _warp_workspace(
                images, ii, bucket, xx, yy, b11, b12, b21, b22, w
            )
            sigma = cfg.patch_smooth_factor * itss
            ksz = (2.0 * 3.0 * sigma + 1.0).astype(jnp.int32)
            ksz = ksz + 1 - (ksz % 2)  # make odd (round up like size++)
            taps = _device_gauss_taps(sigma, ksz, kmax)
            blurred = _blur_one(wsp, taps)
            patch = _subsample_patch(blurred, w, itss, P)
            if mixed:
                # per-keypoint branch routing (affine.cpp:115,135): a
                # keypoint with its <= cutoff takes the direct warp even
                # though the bucket as a whole oversamples
                dpatch, dtouched = _direct_warp(
                    images, ii, xx, yy, b11, b21, b22, itss, P
                )
                direct = itss <= cfg.oversample_cutoff
                patch = jnp.where(direct, dpatch, patch)
                touched = jnp.where(direct, dtouched, touched)
            return patch, touched

        patches, touched = _chunked_vmap(
            chunk_fn,
            (img_idx, x, y, a11, a12, a21, a22, ws, its),
            kc,
            active=active,
        )
        ok = ~corner_bad & ~touched
    else:
        patches, touched = _chunked_vmap(
            lambda ii, xx, yy, b11, b21, b22, itss: _direct_warp(
                images, ii, xx, yy, b11, b21, b22, itss, P
            ),
            (img_idx, x, y, a11, a21, a22, its),
            max(8, min(x.shape[0], 256)),
            active=active,
        )
        ok = ~corner_bad & ~touched
    return patches, ok


def extract_bucket(image: jnp.ndarray, bucket: int, x, y, s,
                   a11, a12, a21, a22, cfg: HesaffConfig):
    """Single-image convenience wrapper around extract_bucket_batch."""
    idx = jnp.zeros(x.shape, jnp.int32)
    return extract_bucket_batch(
        image[None], bucket, idx, x, y, s, a11, a12, a21, a22, cfg
    )
