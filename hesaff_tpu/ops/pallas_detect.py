"""Pallas TPU kernel: fused NMS candidate mask + dense localization maps.

One detection level's XLA path (detect.candidate_mask +
detect._localization_maps) is a long chain of (H, W) stencils — windowed
max/min, ~10 finite-difference derivatives, a per-pixel pivoted 3x3
solve, and the edge test (reference semantics: pyramid.cpp:39-61,
122-171).  XLA materializes dozens of (H, W) intermediates in HBM; this
kernel computes the whole chain on row blocks resident in VMEM and
writes only the 7 consumed outputs:

    b0, b1, b2, peak val, nan flag, edge_bad, candidate mask

Numerics are identical to the XLA path by construction: the same
shift-with-edge-replication stencils (shared with ops/pallas_blur) and
the same pivoting arithmetic (ops/linalg.solve3x3_parts is the single
definition used by both).

Tiled over row blocks with an 8-row halo (the stencils reach +-1; the
halo rides as extra blocked reads of the same edge-padded input, like
blur_doh_tiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.ops.linalg import solve3x3_parts
from hesaff_tpu.ops.pallas_blur import _shift_cols, _shift_rows
from hesaff_tpu.ops.pallas_util import round_up as _round_up


def _make_kernel(TB: int, HALO: int, H: int, W: int, border: int,
                 pos_thr: float, neg_thr: float, edge_thr: float):
    def kernel(low_u, low_m, low_d, cur_u, cur_m, cur_d,
               high_u, high_m, high_d,
               b0_ref, b1_ref, b2_ref, val_ref, nan_ref, edge_ref,
               mask_ref):
        g = pl.program_id(0)

        def halo_cat(up, mid, dn):
            return jnp.concatenate(
                [up[TB - HALO:, :], mid[:], dn[:HALO, :]], axis=0)

        low = halo_cat(low_u, low_m, low_d)
        cur = halo_cat(cur_u, cur_m, cur_d)
        high = halo_cat(high_u, high_m, high_d)

        def sh(a, dr, dc):
            return _shift_cols(_shift_rows(a, dr), dc)

        # --- 3x3x3 strict NMS (ties survive), pyramid.cpp:39-61 ---
        mx = cur
        mn = cur
        for lvl in (low, cur, high):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if lvl is cur and dr == 0 and dc == 0:
                        continue
                    v = sh(lvl, dr, dc)
                    mx = jnp.maximum(mx, v)
                    mn = jnp.minimum(mn, v)
        pos = (cur > pos_thr) & (cur >= mx)
        neg = (cur < neg_thr) & (cur <= mn)
        cand = pos | neg

        # --- dense localization solve (detect._localization_maps) ---
        c = cur
        dxx = sh(c, 0, -1) - 2.0 * c + sh(c, 0, 1)
        dyy = sh(c, -1, 0) - 2.0 * c + sh(c, 1, 0)
        dss = low - 2.0 * c + high
        dxy = 0.25 * (sh(c, 1, 1) - sh(c, 1, -1) - sh(c, -1, 1)
                      + sh(c, -1, -1))
        dxs = 0.25 * (sh(high, 0, 1) - sh(high, 0, -1)
                      - sh(low, 0, 1) + sh(low, 0, -1))
        dys = 0.25 * (sh(high, 1, 0) - sh(high, -1, 0)
                      - sh(low, 1, 0) + sh(low, -1, 0))
        dx = 0.5 * (sh(c, 0, 1) - sh(c, 0, -1))
        dy = 0.5 * (sh(c, 1, 0) - sh(c, -1, 0))
        ds = 0.5 * (high - low)

        b0, b1, b2 = solve3x3_parts(
            [[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]],
            [-dx, -dy, -ds])
        val = c + 0.5 * (dx * b0 + dy * b1 + ds * b2)

        edge_den = dxx * dyy - dxy * dxy
        edge_score = (dxx + dyy) * (dxx + dyy) / edge_den
        edge_bad = (edge_score >= edge_thr) | (edge_score < 0)
        nan_flag = jnp.isnan(b0) | jnp.isnan(b1) | jnp.isnan(b2)

        sl = slice(HALO, HALO + TB)
        # the walk reads cells via one-hot contractions — sanitize NaNs
        # (NaN * 0 == NaN); the flag channel carries the signal
        b0_ref[:] = jnp.nan_to_num(b0[sl])
        b1_ref[:] = jnp.nan_to_num(b1[sl])
        b2_ref[:] = jnp.nan_to_num(b2[sl])
        val_ref[:] = jnp.nan_to_num(val[sl])
        nan_ref[:] = nan_flag[sl].astype(jnp.float32)
        edge_ref[:] = edge_bad[sl].astype(jnp.float32)

        # static border window [border, dim - border) (pyramid.cpp:211-213);
        # a traced valid_hw tightening ANDs on outside the kernel
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TB, cand.shape[1]), 0)
                + g * TB)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TB, cand.shape[1]), 1)
        keep = ((rows >= border) & (rows < H - border)
                & (cols >= border) & (cols < W - border))
        mask_ref[:] = (cand[sl] & keep).astype(jnp.float32)

    return kernel


def _pick_tb(H: int, Wp: int, live: int = 48):
    """Row-block size under the VMEM budget (`live` block-sized values
    through the solve chain; the fused-walk variant carries ~10 more);
    None when even the smallest block would overflow (callers fall
    back to the XLA path)."""
    HALO = 8
    TB = 256
    while TB > 2 * HALO and live * (TB + 2 * HALO) * Wp * 4 > 12 * (1 << 20):
        TB //= 2
    if live * (TB + 2 * HALO) * Wp * 4 > 12 * (1 << 20):
        return None
    return TB, HALO


def detect_maps_fits(height: int, width: int) -> bool:
    """True when the fused kernel's smallest row block fits VMEM."""
    return _pick_tb(height, _round_up(width, 128)) is not None


@functools.partial(jax.jit, static_argnames=("border", "pos_thr", "neg_thr",
                                             "edge_thr", "interpret"))
def detect_maps_pallas(low, cur, high, border: int, pos_thr: float,
                       neg_thr: float, edge_thr: float,
                       interpret: bool = False):
    """Fused candidate mask + localization maps for one detection level.

    low/cur/high: (H, W) float32 DoH responses.  Returns
    (maps (H, W, 4) = [b0, b1, b2, val], nan (H, W) f32, edge_bad (H, W)
    f32, mask (H, W) bool) — same values as the XLA pair
    (candidate_mask, _localization_maps) plus the NaN flag that
    _pack_walk_channels would derive.
    """
    H, W = cur.shape
    Wp = _round_up(W, 128)
    picked = _pick_tb(H, Wp)
    assert picked is not None, "caller must gate on detect_maps_fits"
    TB, HALO = picked
    NB = -(-H // TB)
    Hp = (NB + 2) * TB

    pad = lambda a: jnp.pad(a, ((TB, Hp - TB - H), (0, Wp - W)), mode="edge")
    kernel = _make_kernel(TB, HALO, H, W, border, pos_thr, neg_thr, edge_thr)
    blk = lambda off: pl.BlockSpec((TB, Wp), lambda g, o=off: (g + o, 0),
                                   memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((TB, Wp), lambda g: (g, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[blk(o) for _ in range(3) for o in (0, 1, 2)],
        out_specs=[out_blk] * 7,
        out_shape=[jax.ShapeDtypeStruct((NB * TB, Wp), jnp.float32)] * 7,
        interpret=interpret,
    )(*[pad(a) for a in (low, cur, high) for _ in range(3)])
    b0, b1, b2, val, nan, edge, mask = [o[:H, :W] for o in outs]
    maps = jnp.stack([b0, b1, b2, val], axis=-1)
    return maps, nan, edge, mask.astype(bool)


def _make_walk_kernel(TB: int, HALO: int, H: int, W: int, border: int,
                      pos_thr: float, neg_thr: float, edge_thr: float,
                      max_shift: float, safety: int, iters: int,
                      shift_lim: float, final_thr: float):
    """Fused NMS + localization maps + PACKED DENSE WALK in one pass.

    Extends _make_kernel with the pointer-composition walk
    (detect._walk_dense semantics, pyramid.cpp:122-204): the per-cell
    step relation and stop records are built on the haloed block and
    composed iters-1 times in VMEM — the localization maps never
    round-trip through HBM for the walk.  Walk reach is iters-1 moves
    +-1 plus the Lxx neighbor read (<= 5 <= HALO = 8), so interior
    starts compose entirely from in-block values.

    Outputs 8 planes: [ok, final_cell, b0, b1, b2, val, lxx, cand].
    """
    OKBIT = float(1 << 23)

    def kernel(low_u, low_m, low_d, cur_u, cur_m, cur_d,
               high_u, high_m, high_d, blur_u, blur_m, blur_d,
               ok_ref, cell_ref, b0_ref, b1_ref, b2_ref, val_ref,
               lxx_ref, cand_ref):
        g = pl.program_id(0)

        def halo_cat(up, mid, dn):
            return jnp.concatenate(
                [up[TB - HALO:, :], mid[:], dn[:HALO, :]], axis=0)

        low = halo_cat(low_u, low_m, low_d)
        cur = halo_cat(cur_u, cur_m, cur_d)
        high = halo_cat(high_u, high_m, high_d)
        blur = halo_cat(blur_u, blur_m, blur_d)

        def sh(a, dr, dc):
            return _shift_cols(_shift_rows(a, dr), dc)

        # --- 3x3x3 strict NMS (ties survive), pyramid.cpp:39-61 ---
        mx = cur
        mn = cur
        for lvl in (low, cur, high):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if lvl is cur and dr == 0 and dc == 0:
                        continue
                    v = sh(lvl, dr, dc)
                    mx = jnp.maximum(mx, v)
                    mn = jnp.minimum(mn, v)
        pos = (cur > pos_thr) & (cur >= mx)
        neg = (cur < neg_thr) & (cur <= mn)
        cand = pos | neg

        # --- dense localization solve (detect._localization_maps) ---
        c = cur
        dxx = sh(c, 0, -1) - 2.0 * c + sh(c, 0, 1)
        dyy = sh(c, -1, 0) - 2.0 * c + sh(c, 1, 0)
        dss = low - 2.0 * c + high
        dxy = 0.25 * (sh(c, 1, 1) - sh(c, 1, -1) - sh(c, -1, 1)
                      + sh(c, -1, -1))
        dxs = 0.25 * (sh(high, 0, 1) - sh(high, 0, -1)
                      - sh(low, 0, 1) + sh(low, 0, -1))
        dys = 0.25 * (sh(high, 1, 0) - sh(high, -1, 0)
                      - sh(low, 1, 0) + sh(low, -1, 0))
        dx = 0.5 * (sh(c, 0, 1) - sh(c, 0, -1))
        dy = 0.5 * (sh(c, 1, 0) - sh(c, -1, 0))
        ds = 0.5 * (high - low)

        b0, b1, b2 = solve3x3_parts(
            [[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]],
            [-dx, -dy, -ds])
        val = c + 0.5 * (dx * b0 + dy * b1 + ds * b2)

        edge_den = dxx * dyy - dxy * dxy
        edge_score = (dxx + dyy) * (dxx + dyy) / edge_den
        edge_bad = (edge_score >= edge_thr) | (edge_score < 0)
        nan_flag = jnp.isnan(b0) | jnp.isnan(b1) | jnp.isnan(b2)
        b0 = jnp.nan_to_num(b0)
        b1 = jnp.nan_to_num(b1)
        b2 = jnp.nan_to_num(b2)
        val = jnp.nan_to_num(val)
        lxx = sh(blur, 0, -1) - 2.0 * blur + sh(blur, 0, 1)

        # --- packed dense walk (detect._walk_dense, in VMEM) ---
        HB = cand.shape[0]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (HB, cand.shape[1]),
                                         0) + g * TB - HALO)
        cols = jax.lax.broadcasted_iota(jnp.int32, (HB, cand.shape[1]),
                                        1)
        move_px = b0 > max_shift
        move_nx = b0 < -max_shift
        move_py = b1 > max_shift
        move_ny = b1 < -max_shift
        bad_px = move_px & ~(cols < W - safety)
        bad_nx = move_nx & ~(cols > safety)
        bad_py = move_py & ~(rows < H - safety)
        bad_ny = move_ny & ~(rows > safety)
        border_bad = bad_px | bad_nx | bad_py | bad_ny
        sc = jnp.where(move_px, 1, 0) + jnp.where(move_nx, -1, 0)
        sr = jnp.where(move_py, 1, 0) + jnp.where(move_ny, -1, 0)
        moved = (sc != 0) | (sr != 0)
        stop = nan_flag | border_bad | ~moved

        shift_bad = ((jnp.abs(b0) > shift_lim) | (jnp.abs(b1) > shift_lim)
                     | (jnp.abs(b2) > shift_lim))
        weak = jnp.abs(val) < final_thr
        stop_ok = ~nan_flag & ~border_bad & ~shift_bad & ~weak

        cell_f = (rows * W + cols).astype(jnp.float32)
        rec = cell_f + jnp.where(stop_ok, jnp.float32(OKBIT), 0.0)
        G = rec
        for _ in range(iters - 1):
            cont = jnp.zeros_like(G)
            for a in (-1, 0, 1):
                for b_ in (-1, 0, 1):
                    pred = ((sr == a) & (sc == b_)).astype(jnp.float32)
                    cont = cont + pred * sh(G, a, b_)
            G = jnp.where(stop, rec, cont)

        okbit = G >= OKBIT
        cell = G - jnp.where(okbit, jnp.float32(OKBIT), 0.0)

        # scan-window restriction (pyramid.cpp:211-213); traced
        # valid_hw tightening stays on the XLA path
        keep = ((rows >= border) & (rows < H - border)
                & (cols >= border) & (cols < W - border))
        ok = cand & keep & ~edge_bad & okbit

        sl = slice(HALO, HALO + TB)
        ok_ref[:] = ok[sl].astype(jnp.float32)
        cell_ref[:] = cell[sl]
        b0_ref[:] = b0[sl]
        b1_ref[:] = b1[sl]
        b2_ref[:] = b2[sl]
        val_ref[:] = val[sl]
        lxx_ref[:] = lxx[sl]
        cand_ref[:] = (cand[sl] & keep[sl]).astype(jnp.float32)

    return kernel


def detect_walk_fits(height: int, width: int) -> bool:
    """True when the fused walk kernel's smallest row block fits VMEM."""
    return (_pick_tb(height, _round_up(width, 128), live=58) is not None
            and height * width < (1 << 23))


@functools.partial(jax.jit, static_argnames=(
    "border", "pos_thr", "neg_thr", "edge_thr", "max_shift", "safety",
    "iters", "shift_lim", "final_thr", "interpret"))
def detect_walk_pallas(low, cur, high, blur, border: int, pos_thr: float,
                       neg_thr: float, edge_thr: float, max_shift: float,
                       safety: int, iters: int, shift_lim: float,
                       final_thr: float, interpret: bool = False):
    """One detection level, fully walked in-kernel.

    Returns (ok (H, W) bool, cell (H, W) int32 final cells,
    tab (H, W, 5) = [b0, b1, b2, val, lxx], cand (H, W) bool) — the
    exact inputs detect.detect_octave_batch_dense's post stage needs
    (a traced valid_hw tightening ANDs onto ok/cand outside: the scan
    restriction is a pure start-pixel property).
    """
    H, W = cur.shape
    Wp = _round_up(W, 128)
    picked = _pick_tb(H, Wp, live=58)
    assert picked is not None, "caller must gate on detect_walk_fits"
    TB, HALO = picked
    NB = -(-H // TB)
    Hp = (NB + 2) * TB

    pad = lambda a: jnp.pad(a, ((TB, Hp - TB - H), (0, Wp - W)),
                            mode="edge")
    kernel = _make_walk_kernel(TB, HALO, H, W, border, pos_thr, neg_thr,
                               edge_thr, max_shift, safety, iters,
                               shift_lim, final_thr)
    blk = lambda off: pl.BlockSpec((TB, Wp), lambda g, o=off: (g + o, 0),
                                   memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((TB, Wp), lambda g: (g, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[blk(o) for _ in range(4) for o in (0, 1, 2)],
        out_specs=[out_blk] * 8,
        out_shape=[jax.ShapeDtypeStruct((NB * TB, Wp), jnp.float32)] * 8,
        interpret=interpret,
    )(*[pad(a) for a in (low, cur, high, blur) for _ in range(3)])
    okf, cell, b0, b1, b2, val, lxx, cand = [o[:H, :W] for o in outs]
    tab = jnp.stack([b0, b1, b2, val, lxx], axis=-1)
    return okf > 0.5, cell.astype(jnp.int32), tab, cand > 0.5
