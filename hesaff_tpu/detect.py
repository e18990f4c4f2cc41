"""DoH extrema detection: thresholded 3x3x3 NMS, batched sub-pixel
localization, and octave-map deduplication.

TPU-native redesign of /root/reference/pyramid.cpp:122-222.  The reference
scans pixels serially and localizes each candidate with data-dependent
control flow; here every level produces a dense candidate mask, candidates
compact into a fixed-capacity array (raster order preserved — the dedup
semantics depend on it), and localization runs as a batched, masked,
bounded loop (5 iterations, pyramid.cpp:132).

The reference's octaveMap (pyramid.cpp:189-193) marks the *final* localized
cell of each accepted keypoint, first-come-first-marked in scan order
(level-major, then raster).  That sequential dedup is reproduced exactly
with a stable sort by final cell: within a cell, the earliest scan-order
candidate survives.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.batching import chunked_vmap, compact_indices
from hesaff_tpu.ops.linalg import solve3x3

# fused Pallas candidate-mask + localization-maps kernel (TPU); the
# stencil/solve chain otherwise round-trips dozens of (H, W)
# intermediates through HBM.  Validated on-chip (round 3): fastest
# config in every uncontended A/B pairing (~0.05-0.2 s per batch-16);
# set =0 to fall back to the XLA twin.
_DETECT_PALLAS = os.environ.get("HESAFF_DETECT_PALLAS", "1") == "1"

# dense tile-resident walk (round 5): replace the sparse per-candidate
# localization walks (candidate compaction + chunked window walks +
# scatter — ~55 ms of the r4 batch) with a DENSE pointer-composition
# over the localization maps.  Each pixel's walk step is a pure
# function of its own cell (+-1 px moves, pyramid.cpp:174-185), so the
# full <=5-evaluation walk from EVERY pixel is 4 compositions of a
# per-pixel "next" relation — each composition a 9-way select over
# +-1-shifted state maps.  Overlapping walks share work through the
# composition, no gathers or capacity anywhere before the final
# keypoint compaction, and the whole chain is branch-free stencil math
# (fusable; Pallas-residency candidate).  Bit-exact with the sparse
# walk by construction: identical per-cell map values routed through
# selects.
_DETECT_DENSE = os.environ.get("HESAFF_DETECT_DENSE", "1") == "1"

# run the dense walk INSIDE the fused Pallas detect kernel (one VMEM
# pass; maps never round-trip through HBM for the composition); =0
# keeps the XLA composition over the Pallas maps kernel's outputs
_DETECT_FUSED_WALK = os.environ.get("HESAFF_DETECT_FUSED_WALK",
                                    "1") == "1"

HESSIAN_DARK = 0
HESSIAN_BRIGHT = 1
HESSIAN_SADDLE = 2


class LevelKeypoints(NamedTuple):
    """Fixed-capacity localized keypoints for one detection level."""

    ok: jnp.ndarray        # (K,) bool — accepted (pre-dedup or post-dedup)
    x: jnp.ndarray         # (K,) image-coords (already * pixelDistance)
    y: jnp.ndarray
    s: jnp.ndarray         # (K,) scale (already * pixelDistance)
    response: jnp.ndarray  # (K,) peak DoH value
    type: jnp.ndarray      # (K,) int32 point type
    r_final: jnp.ndarray   # (K,) final integer row (octave grid, for dedup)
    c_final: jnp.ndarray   # (K,) final integer col
    order: jnp.ndarray     # (K,) scan-order rank within the level
    overflow: jnp.ndarray  # () int32 — candidates dropped by capacity
    n_cand: jnp.ndarray    # () int32 — NMS candidates pre-localization


def _nbhd_max(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 windowed max with edge replication (edges unused: border >= 5)."""
    p = jnp.pad(x, 1, mode="edge")
    m = x
    for dr in range(3):
        for dc in range(3):
            if dr == 1 and dc == 1:
                continue
            m = jnp.maximum(m, p[dr : dr + x.shape[0], dc : dc + x.shape[1]])
    return m


def _nbhd_min(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.pad(x, 1, mode="edge")
    m = x
    for dr in range(3):
        for dc in range(3):
            if dr == 1 and dc == 1:
                continue
            m = jnp.minimum(m, p[dr : dr + x.shape[0], dc : dc + x.shape[1]])
    return m


def candidate_mask(low, cur, high, cfg: HesaffConfig,
                   valid_hw=None) -> jnp.ndarray:
    """Thresholded 3x3x3 strict NMS (pyramid.cpp:206-222, isMax/isMin 39-61).

    "Strict" in the reference sense: a candidate survives unless some
    neighbour is strictly greater (ties pass), i.e. val == windowed max.

    valid_hw: optional traced (2,) int32 — the TRUE octave dims when the
    level rides inside a shape-bucket-padded image; the scan window
    [border, dim-border) then uses the true dims (pyramid.cpp:211-213),
    so padding never creates keypoints the unpadded run would not.
    """
    H, W = cur.shape
    mx = jnp.maximum(jnp.maximum(_nbhd_max(low), _nbhd_max(cur)), _nbhd_max(high))
    mn = jnp.minimum(jnp.minimum(_nbhd_min(low), _nbhd_min(cur)), _nbhd_min(high))
    pos = (cur > cfg.positive_threshold) & (cur >= mx)
    neg = (cur < cfg.negative_threshold) & (cur <= mn)
    mask = pos | neg
    b = cfg.border
    h_eff = H if valid_hw is None else valid_hw[0]
    w_eff = W if valid_hw is None else valid_hw[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    keep = ((rows >= b) & (rows < h_eff - b)
            & (cols >= b) & (cols < w_eff - b))
    return mask & keep


def compact_candidates(mask: jnp.ndarray, capacity: int):
    """Raster-order indices of set pixels, padded to `capacity`.

    Row-major order matches the reference's r-then-c scan
    (pyramid.cpp:211-213), which the dedup pass depends on.

    Implemented as cumsum + searchsorted (the j-th candidate is the
    first index whose running count reaches j+1): bandwidth-bound,
    vs jnp.nonzero's full sort which measured 5 ms per 512k-pixel call
    on TPU and dominated the whole detection stage.
    """
    W = mask.shape[-1]
    idx, valid, overflow = compact_indices(mask, capacity)
    return idx // W, idx % W, valid, overflow


def _localization_maps(low, cur, high, cfg: HesaffConfig):
    """Dense per-pixel localization solve (TPU-first reformulation).

    The reference solves the 3x3 quadratic fit only at visited pixels
    (pyramid.cpp:132-171); on TPU the per-candidate gathers cost far
    more than just solving EVERYWHERE with VPU stencils.  Returns
    (maps (H, W, 4) = [b0, b1, b2, peak_val], edge_bad (H, W)); the
    per-candidate walk then reads 4 contiguous floats per step.
    Identical arithmetic per pixel — the solve only depends on position.
    """
    def sh(a, dr, dc):
        p = jnp.pad(a, 1, mode="edge")
        H, W = a.shape
        return p[1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]

    c = cur
    dxx = sh(c, 0, -1) - 2.0 * c + sh(c, 0, 1)
    dyy = sh(c, -1, 0) - 2.0 * c + sh(c, 1, 0)
    dss = low - 2.0 * c + high
    dxy = 0.25 * (sh(c, 1, 1) - sh(c, 1, -1) - sh(c, -1, 1) + sh(c, -1, -1))
    dxs = 0.25 * (sh(high, 0, 1) - sh(high, 0, -1)
                  - sh(low, 0, 1) + sh(low, 0, -1))
    dys = 0.25 * (sh(high, 1, 0) - sh(high, -1, 0)
                  - sh(low, 1, 0) + sh(low, -1, 0))
    dx = 0.5 * (sh(c, 0, 1) - sh(c, 0, -1))
    dy = 0.5 * (sh(c, 1, 0) - sh(c, -1, 0))
    ds = 0.5 * (high - low)

    A = jnp.stack(
        [
            jnp.stack([dxx, dxy, dxs], -1),
            jnp.stack([dxy, dyy, dys], -1),
            jnp.stack([dxs, dys, dss], -1),
        ],
        -2,
    )  # (H, W, 3, 3)
    rhs = -jnp.stack([dx, dy, ds], -1)
    b = solve3x3(A, rhs)  # (H, W, 3)
    val = c + 0.5 * (dx * b[..., 0] + dy * b[..., 1] + ds * b[..., 2])

    edge_den = dxx * dyy - dxy * dxy
    edge_score = (dxx + dyy) * (dxx + dyy) / edge_den
    edge_bad = (edge_score >= cfg.edge_score_threshold) | (edge_score < 0)
    return jnp.concatenate([b, val[..., None]], axis=-1), edge_bad


def _stack_walk_channels(b0, b1, b2, val, nan_f, edge_f, blur):
    """THE walk-pack layout: [b0, b1, b2, val, nan, edge, blur, 0].

    Single constructor — _walk_window's channel reads (v[3]=val,
    v[4]=nan, v[5]=edge, v[6]=blur) depend on this order, and both the
    XLA and fused-Pallas map producers must agree."""
    return jnp.stack(
        [b0, b1, b2, val, nan_f, edge_f, blur, jnp.zeros_like(blur)],
        axis=-1)


def _pack_walk_channels(maps, edge_bad, blur):
    """(H, W, 8) channel pack for the windowed walk.

    NaN solves (solve3x3's singular signal) become an explicit flag
    channel and the values are sanitized: the walk reads cells via
    one-hot contractions, and a raw NaN anywhere in the window would
    poison every read (NaN * 0 == NaN).
    """
    nan_flag = jnp.any(jnp.isnan(maps[..., :3]), axis=-1)
    clean = jnp.nan_to_num(maps)
    return _stack_walk_channels(
        clean[..., 0], clean[..., 1], clean[..., 2], clean[..., 3],
        nan_flag.astype(jnp.float32), edge_bad.astype(jnp.float32), blur)


def _window_starts(r0, c0, rows, cols, cfg: HesaffConfig):
    """Top-left of the walk's fetch window (dynamic_slice-clamped)."""
    R = cfg.localize_iterations - 1
    WR, WC = 2 * R + 1, 2 * R + 3
    # replicate dynamic_slice's start clamp so the in-window center
    # stays correct even when the slice hits an image corner (padding
    # slots, or a non-default border < R+1)
    sr0 = jnp.clip(r0 - R, 0, rows - WR)
    sc0 = jnp.clip(c0 - (R + 1), 0, cols - WC)
    return sr0, sc0, WR, WC


def _walk_one(allm, r0, c0, cur_scale, pixel_distance,
              rows, cols, cfg: HesaffConfig):
    """Per-candidate bounded walk over the dense localization maps.

    Decision logic identical to the reference's localizeKeypoint
    (pyramid.cpp:122-204).  The walk moves at most +-1 px per iteration
    and the last iteration's move is never adopted, so every visited
    cell lies in a (2R+1) x (2R+3) window around the start (R extra
    cols left/right for the final blur-Lxx row).  One contiguous
    dynamic_slice fetches that window; the steps then read cells with
    cheap in-register one-hot contractions instead of per-step gathers
    (scattered 4-float gathers were the detect hot spot on TPU).
    """
    sr0, sc0, WR, WC = _window_starts(r0, c0, rows, cols, cfg)
    w = jax.lax.dynamic_slice(allm, (sr0, sc0, 0), (WR, WC, 8))
    return _walk_window(w, r0 - sr0, c0 - sc0, r0, c0, cur_scale,
                        pixel_distance, rows, cols, cfg)


def _walk_one_flat(allm_flat, src, r0, c0, cur_scale, pixel_distance,
                   rows, cols, cfg: HesaffConfig):
    """_walk_one reading from a stacked (N_maps, H, W, 8) channel pack.

    src selects the (image, level) plane — the flat cross-image walk's
    sampling form (detect_octave_batch)."""
    sr0, sc0, WR, WC = _window_starts(r0, c0, rows, cols, cfg)
    w = jax.lax.dynamic_slice(
        allm_flat, (src, sr0, sc0, 0), (1, WR, WC, 8))[0]
    return _walk_window(w, r0 - sr0, c0 - sc0, r0, c0, cur_scale,
                        pixel_distance, rows, cols, cfg)


def _walk_window(w, cr, cc, r0, c0, cur_scale, pixel_distance,
                 rows, cols, cfg: HesaffConfig):
    """Walk decision loop over a pre-fetched (WR, WC, 8) window with the
    start cell at in-window position (cr, cc)."""
    WR, WC = w.shape[0], w.shape[1]
    ir = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1)

    def at(dr, dc):
        onehot = ((ir == cr + dr)
                  & (ic == cc + dc)).astype(jnp.float32)
        return jnp.sum(w * onehot[..., None], axis=(0, 1))  # (8,)

    dr = jnp.int32(0)
    dc = jnp.int32(0)
    b = jnp.zeros(3, jnp.float32)
    val = jnp.float32(0.0)
    v = at(dr, dc)
    alive = ~(v[5] > 0.5)
    rejected = ~alive
    converged = jnp.bool_(False)

    for it in range(cfg.localize_iterations):
        if it > 0:
            v = at(dr, dc)
        sol = v[:3]
        nan_bad = v[4] > 0.5
        rejected = rejected | (alive & nan_bad)
        alive = alive & ~nan_bad

        b = jnp.where(alive, sol, b)
        val = jnp.where(alive, v[3], val)

        r = r0 + dr
        c = c0 + dc
        move_px = sol[0] > cfg.max_subpixel_shift
        move_nx = sol[0] < -cfg.max_subpixel_shift
        move_py = sol[1] > cfg.max_subpixel_shift
        move_ny = sol[1] < -cfg.max_subpixel_shift
        bad_px = move_px & ~(c < cols - cfg.point_safety_border)
        bad_nx = move_nx & ~(c > cfg.point_safety_border)
        bad_py = move_py & ~(r < rows - cfg.point_safety_border)
        bad_ny = move_ny & ~(r > cfg.point_safety_border)
        border_bad = bad_px | bad_nx | bad_py | bad_ny
        rejected = rejected | (alive & border_bad)
        alive = alive & ~border_bad

        sc = jnp.where(move_px, 1, 0) + jnp.where(move_nx, -1, 0)
        sr = jnp.where(move_py, 1, 0) + jnp.where(move_ny, -1, 0)
        moved = (sc != 0) | (sr != 0)
        converged = converged | (alive & ~moved)
        alive = alive & moved
        if it < cfg.localize_iterations - 1:
            dc = jnp.where(alive, dc + sc, dc)
            dr = jnp.where(alive, dr + sr, dr)

    lim = cfg.final_shift_limit
    shift_bad = (
        (jnp.abs(b[0]) > lim) | (jnp.abs(b[1]) > lim) | (jnp.abs(b[2]) > lim)
    )
    weak = jnp.abs(val) < cfg.final_threshold
    ok = ~rejected & ~shift_bad & ~weak

    scale = cur_scale * jnp.exp2(b[2] / cfg.num_scales)
    lxx = at(dr, dc - 1)[6] - 2.0 * at(dr, dc)[6] + at(dr, dc + 1)[6]
    ptype = jnp.where(
        val < 0,
        HESSIAN_SADDLE,
        jnp.where(lxx < 0, HESSIAN_DARK, HESSIAN_BRIGHT),
    ).astype(jnp.int32)

    r = r0 + dr
    c = c0 + dc
    x = pixel_distance * (c.astype(jnp.float32) + b[0])
    y = pixel_distance * (r.astype(jnp.float32) + b[1])
    s = pixel_distance * scale
    return ok, x, y, s, val, ptype, r, c


def _shift_rep(a, dr, dc):
    """a sampled at (r+dr, c+dc), edge-replicated (shared stencil)."""
    p = jnp.pad(a, 1, mode="edge")
    H, W = a.shape
    return p[1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]


def _walk_dense(allm, cand_mask, cfg: HesaffConfig):
    """Dense pointer-composition walk: every pixel's localization walk
    evaluated simultaneously (tile-resident reformulation of
    pyramid.cpp:122-204; decision logic identical to _walk_window).

    The walk's per-evaluation outcome at a cell is a pure function of
    that cell: NaN/border rejection, the +-1 move (or convergence),
    and the accept checks on the adopted (b, val).  Composing the
    one-step relation k times yields the full walk from every start
    pixel:

        G_1(p)     = stop-record of p (no moves left)
        G_{k+1}(p) = stop(p) ? record(p) : G_k(p + step(p))

    where the continuation read is a 9-way select over +-1-shifted
    G_k maps.  The ENTIRE walk state packs into one f32 channel —
    final-cell index (< 2^23) plus a stop-accept bit at 2^23, all
    values exact integers under f32 — so each composition touches a
    single (H, W) plane (an 8-channel variant measured ~120 ms SLOWER
    than the sparse walk on chip: XLA materialized the shifted stacks;
    see PERF.md r5).  Per-keypoint fields (b, val, Lxx) are fetched
    sparsely at the final cells AFTER compaction, straight from the
    same maps the sparse walk reads — bit-identical routing.

    Returns (ok (H, W) bool — start-pixel acceptance, pre-ANDed with
    cand_mask and the start-cell edge test; cell (H, W) int32 — the
    final cell index r_final * W + c_final of each start's walk).
    """
    H, W = allm.shape[:2]
    assert H * W < (1 << 23), "packed walk channel needs H*W < 2^23"
    b0 = allm[..., 0]
    b1 = allm[..., 1]
    b2 = allm[..., 2]
    val = allm[..., 3]
    nanf = allm[..., 4]
    edgef = allm[..., 5]

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    # per-cell move/rejection relation (pyramid.cpp:174-185 semantics,
    # exactly _walk_window's per-iteration block)
    nan_bad = nanf > 0.5
    move_px = b0 > cfg.max_subpixel_shift
    move_nx = b0 < -cfg.max_subpixel_shift
    move_py = b1 > cfg.max_subpixel_shift
    move_ny = b1 < -cfg.max_subpixel_shift
    bad_px = move_px & ~(cols < W - cfg.point_safety_border)
    bad_nx = move_nx & ~(cols > cfg.point_safety_border)
    bad_py = move_py & ~(rows < H - cfg.point_safety_border)
    bad_ny = move_ny & ~(rows > cfg.point_safety_border)
    border_bad = bad_px | bad_nx | bad_py | bad_ny
    sc = (jnp.where(move_px, 1, 0) + jnp.where(move_nx, -1, 0))
    sr = (jnp.where(move_py, 1, 0) + jnp.where(move_ny, -1, 0))
    moved = (sc != 0) | (sr != 0)
    # a walk stops at this cell: rejected (NaN solve / blocked move)
    # or converged (no move wanted) — or, at the base case, out of
    # evaluations (the last iteration's move is never adopted)
    stop = nan_bad | border_bad | ~moved

    # stop-accept bit: would a walk ENDING at this cell be accepted?
    # (final |b| <= limit, |val| >= threshold, and not nan/border-
    # rejected here — pyramid.cpp:189-190 + the walk's rejections)
    lim = cfg.final_shift_limit
    shift_bad = ((jnp.abs(b0) > lim) | (jnp.abs(b1) > lim)
                 | (jnp.abs(b2) > lim))
    weak = jnp.abs(val) < cfg.final_threshold
    stop_ok = ~nan_bad & ~border_bad & ~shift_bad & ~weak

    OKBIT = jnp.float32(1 << 23)
    cell_f = (rows * W + cols).astype(jnp.float32)
    rec = cell_f + jnp.where(stop_ok, OKBIT, 0.0)     # exact in f32

    G = rec                                           # G_1
    for _ in range(cfg.localize_iterations - 1):
        cont = jnp.zeros_like(G)
        for a in (-1, 0, 1):
            for b_ in (-1, 0, 1):
                pred = ((sr == a) & (sc == b_)).astype(jnp.float32)
                cont = cont + pred * _shift_rep(G, a, b_)
        G = jnp.where(stop, rec, cont)

    okbit = G >= OKBIT
    cell = (G - jnp.where(okbit, OKBIT, 0.0)).astype(jnp.int32)
    ok = cand_mask & ~(edgef > 0.5) & okbit
    return ok, cell


def _level_maps(low, cur, high, blur, cfg: HesaffConfig, valid_hw=None):
    """Candidate mask + packed walk channels for one detection level.

    Dispatches to the fused Pallas kernel (NMS + localization maps in
    one VMEM-resident pass) on TPU when enabled; XLA twin otherwise.
    """
    H, W = cur.shape
    use_fused = (_DETECT_PALLAS and cfg.use_pallas
                 and jax.default_backend() == "tpu")
    if use_fused:
        from hesaff_tpu.ops.pallas_detect import (detect_maps_fits,
                                                  detect_maps_pallas)

        use_fused = detect_maps_fits(H, W)
    if use_fused:
        maps, nanf, edgef, mask = detect_maps_pallas(
            low, cur, high, cfg.border, cfg.positive_threshold,
            cfg.negative_threshold, cfg.edge_score_threshold)
        if valid_hw is not None:
            b = cfg.border
            rr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            mask = mask & (rr < valid_hw[0] - b) & (cc < valid_hw[1] - b)
        allm = _stack_walk_channels(
            maps[..., 0], maps[..., 1], maps[..., 2], maps[..., 3],
            nanf, edgef, blur)
    else:
        mask = candidate_mask(low, cur, high, cfg, valid_hw=valid_hw)
        maps, edge_bad = _localization_maps(low, cur, high, cfg)
        allm = _pack_walk_channels(maps, edge_bad, blur)
    return mask, allm


def detect_level(low, cur, high, blur, cur_scale: float,
                 pixel_distance: float, capacity: int,
                 cfg: HesaffConfig, valid_hw=None) -> LevelKeypoints:
    """Candidates + batched localization for one detection level.

    Localization solves the quadratic fit DENSELY (VPU stencils over the
    whole level, _localization_maps) and only the bounded +-1 walk runs
    per candidate, reading 4 contiguous floats per step — per-candidate
    3x3x3 gathers + solves were the detection hot spot on TPU.
    """
    H, W = cur.shape
    mask, allm = _level_maps(low, cur, high, blur, cfg, valid_hw=valid_hw)
    rows, cols, valid, overflow = compact_candidates(mask, capacity)

    loc = jax.vmap(
        lambda r, c: _walk_one(
            allm, r, c,
            jnp.float32(cur_scale), jnp.float32(pixel_distance),
            H, W, cfg,
        )
    )(rows, cols)
    ok, x, y, s, val, ptype, r_f, c_f = loc
    ok = ok & valid
    order = jnp.arange(capacity, dtype=jnp.int32)
    return LevelKeypoints(
        ok=ok, x=x, y=y, s=s, response=val, type=ptype,
        r_final=r_f, c_final=c_f, order=order, overflow=overflow,
        n_cand=jnp.sum(mask.astype(jnp.int32)),
    )


def compact_levels(levels: list[LevelKeypoints], capacity: int):
    """Compact the accepted keypoints of an octave's 3 levels into one
    fixed-capacity array (emission order preserved: level-major, then
    raster).  The downstream affine stage is the expensive per-keypoint
    loop, so it should run on this compacted set, not on the 3x-capacity
    masked level arrays.

    Returns dict with (capacity,)-shaped fields: ok, level (1-based
    detection level), x, y, s, response, type, and the overflow count.
    """
    ok = jnp.concatenate([lk.ok for lk in levels])
    idx, valid, overflow = compact_indices(ok, capacity)
    cat = lambda f: jnp.concatenate([getattr(lk, f) for lk in levels])[idx]
    lvl = jnp.concatenate([
        jnp.full(lk.ok.shape[0], i + 1, jnp.int32)
        for i, lk in enumerate(levels)
    ])[idx]
    return dict(
        ok=valid, level=lvl,
        x=cat("x"), y=cat("y"), s=cat("s"),
        response=cat("response"), type=cat("type"),
        overflow=overflow,
    )


def dedup_octave(levels: list[LevelKeypoints], H: int, W: int):
    """Emulate the octaveMap first-come-first-marked dedup across levels.

    Accepted keypoints sharing a final cell keep only the earliest in
    (level, raster) scan order — exactly the sequential marking of
    pyramid.cpp:189-193.  Returns the per-level `ok` masks, updated.
    """
    cell = jnp.concatenate(
        [lvl.r_final * W + lvl.c_final for lvl in levels]
    )
    ok = jnp.concatenate([lvl.ok for lvl in levels])
    order = jnp.concatenate(
        [
            lvl.order + i * (H * W)
            for i, lvl in enumerate(levels)
        ]
    )
    big = H * W + 1
    key = jnp.where(ok, cell, big)  # rejected entries sort to the end
    # stable sort by cell key; ties keep scan order because `order` is
    # ascending within each level block and levels are concatenated in
    # scan order with jnp.sort's stability over the secondary sort below.
    perm = jnp.argsort(key, stable=True)
    # within equal keys argsort(stable) preserves input order; input order
    # across levels is exactly scan order only if capacity slots are in
    # raster order (they are) and levels concatenated in level order (they
    # are) — so no secondary sort needed.
    sorted_key = key[perm]
    first = jnp.concatenate(
        [jnp.asarray([True]), sorted_key[1:] != sorted_key[:-1]]
    )
    keep_sorted = first & (sorted_key != big)
    keep = jnp.zeros_like(ok).at[perm].set(keep_sorted)
    sizes = [lvl.ok.shape[0] for lvl in levels]
    out = []
    start = 0
    for lvl, n in zip(levels, sizes):
        out.append(lvl._replace(ok=keep[start : start + n]))
        start += n
    return out


def _dedup_compacted(cell, valid, big: int):
    """First-come-first-marked dedup over an already-compacted slot
    array (slots in scan order).  Same octaveMap semantics as
    dedup_octave (pyramid.cpp:189-193), on acap slots instead of
    3x-candidate-capacity level arrays."""
    key = jnp.where(valid, cell, big)
    perm = jnp.argsort(key, stable=True)
    sorted_key = key[perm]
    first = jnp.concatenate(
        [jnp.asarray([True]), sorted_key[1:] != sorted_key[:-1]])
    keep_sorted = first & (sorted_key != big)
    return jnp.zeros_like(valid).at[perm].set(keep_sorted)


def detect_octave_batch_dense(resps, blurs, sig, pd: float,
                              cfg: HesaffConfig, octave: int = 0,
                              valid_hw=None):
    """Whole-batch octave detection via the dense packed walk.

    Per level: fused maps (+ NMS mask) -> _walk_dense -> dense
    (ok, final-cell) planes.  Then ONE per-image compaction over the
    (3, H, W) accepted mask (level-major raster order == the
    reference's scan order), a sparse fetch of (b0, b1, b2, val, Lxx)
    at the acap final cells from the SAME maps the sparse walk reads,
    and octaveMap dedup on the acap slots.  No candidate capacities,
    no sparse walk machinery; overflow exists only at the final acap
    compaction (counted, never silent).

    Equivalent to the sparse path whenever the sparse path's candidate
    capacities did not overflow (the dense walk has none to overflow).
    """
    B = resps.shape[0]
    H, W = resps.shape[-2], resps.shape[-1]
    HW = H * W
    acap = cfg.affine_capacity(H, W, octave)

    # fully-fused per-level kernel (NMS + maps + walk in one VMEM
    # pass) when available; a traced valid_hw tightening is a pure
    # start-pixel property, so it ANDs onto the kernel's ok/cand
    # planes outside (identical to the XLA path's mask AND order)
    use_fused_walk = (_DETECT_PALLAS and _DETECT_FUSED_WALK
                      and cfg.use_pallas
                      and jax.default_backend() == "tpu")
    if use_fused_walk:
        from hesaff_tpu.ops.pallas_detect import detect_walk_fits

        use_fused_walk = detect_walk_fits(H, W)

    ok_pl, cell_pl, tab_pl, ncand_pl = [], [], [], []
    for l in (1, 2, 3):
        def per_image(low, cur, high, blur, vhw=None):
            if use_fused_walk:
                from hesaff_tpu.ops.pallas_detect import \
                    detect_walk_pallas

                ok, cell, tab, cand = detect_walk_pallas(
                    low, cur, high, blur, cfg.border,
                    cfg.positive_threshold, cfg.negative_threshold,
                    cfg.edge_score_threshold, cfg.max_subpixel_shift,
                    cfg.point_safety_border, cfg.localize_iterations,
                    cfg.final_shift_limit, cfg.final_threshold)
                if vhw is not None:
                    b = cfg.border
                    rr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                    cc = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
                    lim = (rr < vhw[0] - b) & (cc < vhw[1] - b)
                    ok = ok & lim
                    cand = cand & lim
                return ok, cell, tab, jnp.sum(cand.astype(jnp.int32))
            mask, allm = _level_maps(low, cur, high, blur, cfg,
                                     valid_hw=vhw)
            ok, cell = _walk_dense(allm, mask, cfg)
            # field table for the sparse final-cell fetch: the walk
            # reads b/val at the final cell and blur-Lxx around it
            lxx = (_shift_rep(allm[..., 6], 0, -1)
                   - 2.0 * allm[..., 6]
                   + _shift_rep(allm[..., 6], 0, 1))
            tab = jnp.stack(
                [allm[..., 0], allm[..., 1], allm[..., 2],
                 allm[..., 3], lxx], axis=-1)          # (H, W, 5)
            return ok, cell, tab, jnp.sum(mask.astype(jnp.int32))

        args = (resps[:, l - 1], resps[:, l], resps[:, l + 1],
                blurs[:, l])
        if valid_hw is None:
            ok, cell, tab, nc = jax.vmap(
                lambda lo, cu, hi, b: per_image(lo, cu, hi, b))(*args)
        else:
            ok, cell, tab, nc = jax.vmap(per_image)(*args, valid_hw)
        ok_pl.append(ok)
        cell_pl.append(cell)
        tab_pl.append(tab)
        ncand_pl.append(nc)

    ok_all = jnp.stack(ok_pl, axis=1)                 # (B, 3, H, W)
    cell_all = jnp.stack(cell_pl, axis=1)             # (B, 3, H, W)
    tab_all = jnp.stack(tab_pl, axis=1)               # (B, 3, H, W, 5)
    n_cand = sum(ncand_pl)
    sig_v = jnp.asarray(sig, jnp.float32)
    pdf = jnp.float32(pd)

    def post(ok_i, cell_i, tab_i):
        flat_ok = ok_i.reshape(-1)                    # (3*H*W,)
        idx, valid, overflow = compact_indices(flat_ok, acap)
        level0 = (idx // HW).astype(jnp.int32)        # 0-based level-1
        cellk = jnp.take(cell_i.reshape(-1), idx)     # final cells
        rec = jnp.take(tab_i.reshape(3 * HW, 5),
                       level0 * HW + cellk, axis=0)   # (acap, 5)
        b0k, b1k, b2k, valk, lxxk = (rec[:, i] for i in range(5))
        rf = cellk // W
        cf = cellk - rf * W
        x = pdf * (cf.astype(jnp.float32) + b0k)
        y = pdf * (rf.astype(jnp.float32) + b1k)
        scale = (sig_v[level0 + 1]
                 * jnp.exp2(b2k / cfg.num_scales))
        sk = pdf * scale
        ptype = jnp.where(
            valk < 0,
            HESSIAN_SADDLE,
            jnp.where(lxxk < 0, HESSIAN_DARK, HESSIAN_BRIGHT),
        ).astype(jnp.int32)
        keep = _dedup_compacted(cellk, valid, HW + 1)
        return dict(
            ok=keep, level=jnp.where(valid, level0 + 1, 1),
            x=x, y=y, s=sk, response=valk, type=ptype,
            overflow=overflow,
        )

    out = jax.vmap(post)(ok_all, cell_all, tab_all)
    out["n_cand"] = n_cand
    return out


def detect_octave_batch(resps, blurs, sig, pd: float, cfg: HesaffConfig,
                        octave: int = 0, valid_hw=None, chunk: int = 0):
    """Whole-batch octave detection with flat cross-image walks.

    Same per-candidate arithmetic as the vmapped per-image path
    (detect_level x3 + dedup_octave + compact_levels — the helpers are
    shared), but the per-candidate walks run ONCE over the compacted
    cross-image candidate set in runtime-skipped chunks.  Per-level
    capacities are sized for worst-case images, so ~90% of per-image
    walk slots are padding on typical imagery (measured); compaction
    packs the real candidates of all B images and 3 levels into the
    leading chunks and the padding chunks short-circuit (chunked_vmap).

    resps: (B, 5, H, W), blurs: (B, 5, H, W), sig: per-level sigmas.
    Returns the dict of (B, acap) fields that batch.detect_affine_batch
    consumes (ok/level/x/y/s/response/type + overflow/n_cand per image).
    """
    if _DETECT_DENSE and resps.shape[-2] * resps.shape[-1] < (1 << 23):
        # the packed walk channel carries cell + accept bit as exact
        # f32 integers; images at/over 2^23 px (~4k x 2k) keep the
        # sparse path
        return detect_octave_batch_dense(resps, blurs, sig, pd, cfg,
                                         octave=octave,
                                         valid_hw=valid_hw)
    B = resps.shape[0]
    H, W = resps.shape[-2], resps.shape[-1]
    cap = cfg.level_capacity(H, W, octave)
    acap = cfg.affine_capacity(H, W, octave)
    if not chunk:
        # walk-chunk size: larger chunks mean fewer cond-wrapped
        # dispatches (runtime padding skip stays effective because
        # compaction packs real candidates into the leading chunks);
        # env-tunable for on-chip sweeps
        chunk = int(os.environ.get("HESAFF_WALK_CHUNK", "512"))

    # walk each level's candidates right after building that level's
    # channel pack, so only ONE (B, H, W, 8) map is live at a time —
    # stacking all 3 levels ((B*3, H, W, 8) f32) was the batch-scaling
    # memory wall (25 GB at batch 32 on 800x640, > the 16 GB HBM)
    per_level, pre_o, pre_n = [], [], []
    for l in (1, 2, 3):
        def pre(low, cur, high, blur, vhw=None):
            mask, allm = _level_maps(low, cur, high, blur, cfg,
                                     valid_hw=vhw)
            r, c, v, ov = compact_candidates(mask, cap)
            return r, c, v, ov, jnp.sum(mask.astype(jnp.int32)), allm

        args = (resps[:, l - 1], resps[:, l], resps[:, l + 1], blurs[:, l])
        if valid_hw is None:
            outs = jax.vmap(lambda lo, cu, hi, b: pre(lo, cu, hi, b))(*args)
        else:
            outs = jax.vmap(pre)(*args, valid_hw)
        rows, cols, valid, ov, nc, allm = outs
        pre_o.append(ov)
        pre_n.append(nc)

        # flat cross-image walk for this level (runtime-skipped chunks)
        total_l = B * cap
        idx, pv, _ = compact_indices(valid.reshape(-1), total_l)
        src = (idx // cap).astype(jnp.int32)      # image plane
        r0 = rows.reshape(-1)[idx]
        c0 = cols.reshape(-1)[idx]
        walked = chunked_vmap(
            lambda s_i, rr, cc: _walk_one_flat(
                allm, s_i, rr, cc, jnp.float32(sig[l]), jnp.float32(pd),
                H, W, cfg),
            (src, r0, c0), chunk, active=pv)
        safe = jnp.where(pv, idx, total_l)        # padding scatters drop
        scat = lambda v: jnp.zeros((total_l,), v.dtype).at[safe].set(
            v, mode="drop").reshape(B, cap)
        per_level.append([scat(v) for v in walked])

    # (B, 3, cap) stacks in level order for dedup/compaction
    okw, xw, yw, sw, valw, tw, rfw, cfw = (
        jnp.stack([lvl[i] for lvl in per_level], axis=1)
        for i in range(8))

    order = jnp.arange(cap, dtype=jnp.int32)

    def post(ok_i, x_i, y_i, s_i, val_i, t_i, rf_i, cf_i, ov_i, nc_i):
        levels = [
            LevelKeypoints(
                ok=ok_i[i], x=x_i[i], y=y_i[i], s=s_i[i],
                response=val_i[i], type=t_i[i], r_final=rf_i[i],
                c_final=cf_i[i], order=order, overflow=ov_i[i],
                n_cand=nc_i[i])
            for i in range(3)
        ]
        levels = dedup_octave(levels, H, W)
        comp = compact_levels(levels, acap)
        comp["overflow"] = comp["overflow"] + sum(
            lk.overflow for lk in levels)
        comp["n_cand"] = sum(lk.n_cand for lk in levels)
        return comp

    return jax.vmap(post)(okw, xw, yw, sw, valw, tw, rfw, cfw,
                          jnp.stack(pre_o, 1), jnp.stack(pre_n, 1))
