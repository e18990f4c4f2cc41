"""Pallas TPU kernel: fused patch normalization (warp + blur + subsample).

The XLA bucket path (patches.extract_bucket_batch) materializes the
one-hot y-resample operands ((chunk, bucket, WY) per scanned output
row) in HBM — O(bucket^2 * WY) bytes per keypoint, measured ~650 ms of
a batch-16 run across 16 bucket stages.  This kernel runs the whole
pipeline per keypoint with the source window resident in VMEM:

  window (WY, WX) --DMA--> VMEM
  x-pass   ys = win @ ExT          (MXU; ExT one-hot from wx(q))
  y-pass   ws[j, :] = sum_y Ey_j * ys[base_j : base_j+LY]   (VPU loop)
  blur     separable shift-add, per-keypoint taps (SMEM)
  subsample patch = S @ blurred @ ST                         (MXU)

HBM traffic = one window read + one 41x41 write per keypoint.  The
numerics mirror patches._warp_workspace / _blur_one / _subsample_patch
(same one-hot weights, clamp-replicate trick, OpenCV tap rule) against
/root/reference/affine.cpp:102-144.

The y-pass slices an LY-row band of ys per output row (band origin
from the row's analytic min sample coordinate); keypoints whose shear
|a21| * bucket exceeds the band fall back to the full-WY loop via
lax.cond.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.pallas_util import dma_plumbing as _dma_plumbing
from hesaff_tpu.ops.pallas_util import dot_bf16x3
from hesaff_tpu.ops.pallas_util import round_up as _round_up

_HI = jax.lax.Precision.HIGHEST

# Fold the anti-alias blur into the subsample operator (round 5):
# blur B and subsample S are both linear in the workspace, so
# patch = S B ws B^T S^T = R ws R^T with R = S.B built per keypoint
# directly from its taps — R[p, c'] = sum_t taps[t] *
# hat(pos_p - c' - r + t) plus the replicate-boundary mass folded
# into the edge columns (identical semantics to the shift-add blur's
# clip: blurred[c] = sum_t taps[t] * ws[clip(c + t - r)]).  Kills the
# 2*KMAX scratch-mediated shift-add passes over (bucket, bucket)
# (~45 ms of the r4 batch) in favor of KMAX hat terms over
# (P, bucket) and one extra MXU matmul.
_FOLD = os.environ.get("HESAFF_PATCH_FOLD", "1") == "1"

# cross-grid-step DMA double buffering (see pallas_util.dma_plumbing):
# prefetch the next block's windows while this block computes.  Window
# scratch doubles, so it engages only where the doubled footprint fits
# the scoped-VMEM budget (see patches_pallas).  Default ON: round-3
# on-chip A/B measured +11% end-to-end with both DMA pipes.
_DMA_PIPE = os.environ.get("HESAFF_PATCH_DMA_PIPE", "1") == "1"

# PROFILING ONLY (breaks output parity): truncate the kernel after the
# x-pass ("xonly") or skip the per-keypoint blur ("noblur") so on-chip
# timing differences attribute the kernel's internal stages.
_PROFILE = os.environ.get("HESAFF_PATCH_PROFILE", "")

# (A tighter ~24-row first band tier for the y-pass cascade was A/B'd
# on chip in round 4 and LOST — 40-45k vs 52.1k desc/s with per-group
# stage times UNCHANGED: the extra nested cond + third loop instance
# cost more than the narrower Ey construction saved.  Deleted; the
# cascade below keeps its two measured tiers.)

# (A lane-packed batched blur — one set of KMAX shifted multiply-adds
# on (bucket, KB*width) arrays instead of KB per-keypoint sets — was
# bit-identical in interpret mode but measured 22% SLOWER end-to-end on
# chip (40.7k vs 52.1k desc/s, round-4 A/B): per-keypoint (49, 49) ops
# sit lane-aligned at offset 0 and cost ~7 vregs each, while the packed
# layout's 49-lane block offsets forced masked read-modify-write fixups
# on every store/slice.  Lane packing only pays when ops underfill one
# vreg.  Deleted per the sweep record in PERF.md.)


def group_geometry(bucket: int, height: int, width: int,
                   patch_size: int, smooth_factor: float):
    """Static (WY, WX, KMAX, LY, CY, CX) for a bucket-group kernel.

    CY/CX are the coverage window sides (what the warp extent needs,
    centered on the keypoint); WY/WX are the tile-ALIGNED DMA superset
    sides — row origins align down to 8 and col origins to 128 (Mosaic
    requires provably tile-aligned dynamic HBM slices), so the copied
    window carries +8 / +128 margin, capped at the padded image dims.

    The geometry covers the anisotropy-6 worst case (row norms up to
    sqrt(6): y extent (|a21|+a22) up to ~3.5, affine.cpp:89).  A
    narrow-geometry variant for the near-isotropic majority was A/B'd
    on chip in round 3 and LOST (43.5k vs 52.7k desc/s — splitting each
    group into two kernels doubled the dominant per-grid-step fixed
    costs); deleted, see PERF.md.
    """
    hp = _round_up(height, 8)
    wp = _round_up(width, 128)
    cy = min(height, ((int(3.5 * bucket) + 15) // 8) * 8)
    cx = min(width, ((int(2.5 * bucket) + 15) // 8) * 8)
    wy = min(hp, cy + 8)
    wx = min(wp, _round_up(cx, 128) + 128)
    its_max = (bucket - 2) / patch_size
    kmax = int(2.0 * 3.0 * smooth_factor * its_max + 1.0)
    kmax += 1 - (kmax % 2)
    ly = min(wy, _round_up(max(72, bucket // 2 + 16), 8) + 8)
    return wy, wx, kmax, ly, cy, cx


def _group_kb(bucket: int) -> int:
    """Keypoints per grid step, bounded by the 16 MB scoped VMEM
    (window scratch KB*WY*WX*4 dominates; measured: bucket 193 at KB=4
    allocates 16.16 MB).

    HESAFF_PATCH_KB overrides the small-bucket (<=128) block size for
    on-chip sweeps — fewer grid steps amortize per-step fixed costs
    (DMA waits, scalar-core band setup); patches_pallas halves an
    override that would blow the scoped-VMEM budget.  The override is
    rounded down to a power of two so halving preserves the caller's
    K-divisibility."""
    if bucket <= 128:
        kb = 8
    elif bucket <= 160:
        return 4
    else:
        return 2 if bucket <= 512 else 1
    env = os.environ.get("HESAFF_PATCH_KB", "")
    if env:
        kb = max(1, int(env))
        while kb & (kb - 1):
            kb &= kb - 1          # round down to a power of two
    return kb


def _narrow_band(bucket: int, LY: int) -> int:
    """Low-shear band side (most keypoints have |a21| << the LY bound;
    a narrower band cuts the y-pass's per-row vector work ~2x).  The
    group selection shear-sorts keypoints so KB-blocks are shear-
    homogeneous and the narrow path actually engages."""
    return min(LY, _round_up(max(40, bucket // 3), 8))


# output rows per y-pass iteration (amortizes the scalar-core band
# selection and the loop overhead); env-tunable for on-chip sweeps
_ROWS = int(os.environ.get("HESAFF_PATCH_ROWS", "4"))


def _make_kernel(bucket: int, WY: int, WX: int, KMAX: int, LY: int,
                 H: int, W: int, cfg: HesaffConfig, KB: int,
                 pipe: bool = False):
    P = cfg.patch_size
    half_p = P >> 1
    r_blur = KMAX // 2
    LYN = _narrow_band(bucket, LY)
    R = _ROWS
    bucketR = _round_up(bucket, R)

    def kernel(*refs):
        (act_ref, rb_ref, cb_ref, img_ref, ws_ref,
         x_ref, y_ref, a11_ref, a21_ref, a22_ref, its_ref, taps_ref,
         *rest) = refs
        next_scalars = None
        if pipe:
            # (+1-shifted views, ordered like dma_plumbing's contract)
            imgn, rbn, cbn, actn = rest[:4]
            next_scalars, rest = (imgn, rbn, cbn, actn), rest[4:]
        (images_ref, patch_ref, bad_ref,
         win, wsbuf, ysbuf, vxbuf, rowacc, badacc, padv, blurv,
         padh, sems) = rest
        start_cur, start_nxt, wait_cur, window_of = _dma_plumbing(
            images_ref, win, sems, WY, WX, pipe, KB, next_scalars)

        start_cur(img_ref, rb_ref, cb_ref, act_ref)
        start_nxt()

        # ---- x-pass per keypoint: ysbuf[kb] = win[kb] @ ExT ----
        for kb in range(KB):
            @pl.when(act_ref[0, 0, kb] != 0)
            def _():
                wait_cur(kb, img_ref, rb_ref, cb_ref)
                x = x_ref[0, 0, kb]
                a11 = a11_ref[0, 0, kb]
                ws = ws_ref[0, 0, kb]
                c0f = jnp.float32(cb_ref[0, 0, kb] * 128)
                half = jnp.float32(ws >> 1)
                wsm1 = jnp.float32(ws - 1)
                # warp x-coordinates depend only on the output column q:
                # compute as a (1, bucket) row and broadcast into the
                # hat-identity one-hot (bit-exact with the select form —
                # see pallas_affine module doc)
                q_x = jax.lax.broadcasted_iota(
                    jnp.int32, (1, bucket), 1).astype(jnp.float32)
                eff_x = jnp.minimum(q_x, wsm1) - half
                wxq = x + eff_x * a11
                x0f = jnp.floor(wxq)
                validf_x = ((x0f >= 0) & (x0f < W - 1)).astype(jnp.float32)
                iota_wx = jax.lax.broadcasted_iota(
                    jnp.int32, (WX, bucket), 0).astype(jnp.float32)
                ExT = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_wx - (wxq - c0f))) * validf_x
                ysbuf[kb] = dot_bf16x3(window_of(kb), ExT)  # (WY, bucket)
                vxbuf[kb] = validf_x

            @pl.when(act_ref[0, 0, kb] == 0)
            def _():
                # scratch may hold stale/NaN bits; the batched y-pass
                # multiplies every slot, so inactive rows must be finite
                ysbuf[kb] = jnp.zeros((WY, bucket), jnp.float32)
                vxbuf[kb] = jnp.zeros((1, bucket), jnp.float32)

        # ---- y-pass: ONE row loop batched over all KB keypoints ----
        # (the per-keypoint row loop was the stage hotspot: bucket
        # sequential (LY, bucket) chains per keypoint; batching widens
        # each iteration to (KB, LY, bucket) and cuts iterations KB-fold)
        def vec(ref, dtype=jnp.float32):
            # (KB, 1, 1) built by stacking (1, 1) broadcasts — a bare
            # scalar stack + reshape is an unsupported Mosaic shape cast
            return jnp.stack([
                jnp.full((1, 1), ref[0, 0, kb]).astype(dtype)
                for kb in range(KB)
            ])

        yv = vec(y_ref)
        a21v = vec(a21_ref)
        a22v = vec(a22_ref)
        wsv = vec(ws_ref, jnp.int32)
        actv = vec(act_ref, jnp.int32)
        r0fv = vec(rb_ref, jnp.float32) * 8.0
        halfv = (wsv >> 1).astype(jnp.float32)
        wsm1v = (wsv - 1).astype(jnp.float32)
        iota_b = jax.lax.broadcasted_iota(
            jnp.int32, (KB, 1, bucket), 2).astype(jnp.float32)
        eff_i = jnp.minimum(iota_b, wsm1v) - halfv     # (KB, 1, bucket)
        cy = yv + eff_i * a21v
        vxf = vxbuf[:]                                  # (KB, 1, bucket)

        badacc[:] = jnp.zeros((KB, 1, bucket), jnp.float32)

        def make_row_fast(LYB):
            iota_lyb = jax.lax.broadcasted_iota(
                jnp.int32, (KB, LYB, bucket), 1).astype(jnp.float32)

            def row_fast(jb, carry):
                j0 = jb * R
                # per-keypoint band origin on the SCALAR core (vector->
                # scalar extraction crashes Mosaic's layout inference);
                # one band covers the R-row block (a22 > 0 after
                # rectification, so the minimum lands on row j0 and the
                # fast_ok margin below budgets the (R-1)*a22 growth)
                bands = []
                basefs = []
                for kb in range(KB):
                    yk = y_ref[0, 0, kb]
                    a21k = a21_ref[0, 0, kb]
                    a22k = a22_ref[0, 0, kb]
                    wsk = ws_ref[0, 0, kb]
                    halfk = jnp.float32(wsk >> 1)
                    wsm1k = jnp.float32(wsk - 1)
                    e0 = -halfk
                    e1 = jnp.minimum(jnp.float32(bucket - 1),
                                     wsm1k) - halfk
                    cmink = jnp.minimum(yk + e0 * a21k, yk + e1 * a21k)
                    effjk = jnp.minimum(jnp.float32(j0), wsm1k) - halfk
                    r0fk = jnp.float32(rb_ref[0, 0, kb] * 8)
                    b8 = jnp.clip(
                        (cmink - r0fk + effjk * a22k - 1.0)
                        .astype(jnp.int32) // 8,
                        0, (WY - LYB) // 8)
                    bands.append(ysbuf[kb, pl.ds(b8 * 8, LYB), :])
                    basefs.append(
                        jnp.full((1, 1), b8 * 8).astype(jnp.float32))
                bands = jnp.stack(bands)                # (KB, LYB, bucket)
                basef = jnp.stack(basefs)               # (KB, 1, 1)
                for r in range(R):
                    effj = jnp.minimum(jnp.float32(j0 + r), wsm1v) - halfv
                    wyj = cy + effj * a22v              # (KB, 1, bucket)
                    y0f = jnp.floor(wyj)
                    validyf = ((y0f >= 0)
                               & (y0f < H - 1)).astype(jnp.float32)
                    Ey = jnp.maximum(
                        0.0,
                        1.0 - jnp.abs(iota_lyb - (wyj - r0fv - basef))
                    ) * validyf
                    # per-row size-1 dynamic stores (the only dynamic
                    # sublane-store shape proven to lower on hardware)
                    wsbuf[:, pl.ds(j0 + r, 1), :] = jnp.sum(
                        Ey * bands, axis=1, keepdims=True)
                    badacc[:] = jnp.maximum(badacc[:],
                                            1.0 - validyf * vxf)
                return carry

            return row_fast

        def row_full(j, carry):
            # shear fallback: accumulate 128-row bands through scratch
            effj = jnp.minimum(jnp.float32(j), wsm1v) - halfv
            wyj = cy + effj * a22v
            y0f = jnp.floor(wyj)
            validyf = ((y0f >= 0) & (y0f < H - 1)).astype(jnp.float32)
            rowacc[:] = jnp.zeros((KB, 1, bucket), jnp.float32)
            for b0 in range(0, WY, 128):
                n = min(128, WY - b0)
                eyb = (jax.lax.broadcasted_iota(
                    jnp.int32, (KB, n, bucket), 1).astype(jnp.float32)
                    + b0) - (wyj - r0fv)
                Eyb = jnp.maximum(0.0, 1.0 - jnp.abs(eyb)) * validyf
                rowacc[:] += jnp.sum(
                    Eyb * ysbuf[:, b0:b0 + n, :], axis=1, keepdims=True)
            wsbuf[:, pl.ds(j, 1), :] = rowacc[:]
            badacc[:] = jnp.maximum(badacc[:], 1.0 - validyf * vxf)
            return carry

        # band-tier cascade: pick the tightest band whose side covers
        # every keypoint's per-R-row-block sample span (scalar-core
        # decision per tier); fall back to the full-WY loop otherwise
        tiers = sorted({t for t in (LYN, LY) if t <= LY})
        nR = bucketR // R
        if _FOLD:
            # workspace rows >= ws replicate row ws-1 (the warp clamps
            # eff) and the folded R is ws-clipped, so rows beyond the
            # block's max true workspace are never read — bound the row
            # loops by the real extent (avg ~15-20% bucket slack).
            # They must still be FINITE for the R matmul (0*NaN = NaN):
            # zero-fill the buffer once, then let the loop overwrite
            # the live rows.
            wsbuf[:] = jnp.zeros((KB, bucketR, bucket), jnp.float32)
            maxws = ws_ref[0, 0, 0]
            for kb in range(1, KB):
                maxws = jnp.maximum(maxws, ws_ref[0, 0, kb])
            n_rows_fast = (maxws + (R - 1)) // R
            n_rows_full = maxws
        else:
            n_rows_fast = nR
            n_rows_full = bucket
        if _PROFILE == "xonly":
            # profiling cut: only the DMA + x-pass ran; emit dummies
            for kb in range(KB):
                patch_ref[kb] = jnp.zeros((P, P), jnp.float32)
                bad_ref[0, 0, kb] = 1
            return
        oks = []
        for size in tiers:
            ok = jnp.bool_(True)
            for kb in range(KB):
                wsm1k = jnp.float32(ws_ref[0, 0, kb] - 1)
                spank = (jnp.abs(a21_ref[0, 0, kb]) * wsm1k
                         + jnp.float32(R - 1) * a22_ref[0, 0, kb] + 4.0)
                inactive = act_ref[0, 0, kb] == 0
                ok = ok & ((spank <= size - 10) | inactive)
            oks.append(ok)

        def cascade(i):
            if i == len(tiers):
                return lambda: jax.lax.fori_loop(
                    0, n_rows_full, row_full, jnp.int32(0))
            return lambda: jax.lax.cond(
                oks[i],
                lambda: jax.lax.fori_loop(
                    0, n_rows_fast, make_row_fast(tiers[i]),
                    jnp.int32(0)),
                cascade(i + 1),
            )

        cascade(0)()

        # ---- per-keypoint separable blur + subsample ----
        for kb in range(KB):
            @pl.when(act_ref[0, 0, kb] != 0)
            def _():
                ws = ws_ref[0, 0, kb]
                its = its_ref[0, 0, kb]
                half = jnp.float32(ws >> 1)
                if _FOLD and _PROFILE != "noblur":
                    # folded epilogue: patch = R @ ws @ R^T
                    ofs = jnp.float32(ws >> 1)
                    wsm1f = jnp.float32(ws - 1)
                    k_s = jax.lax.broadcasted_iota(
                        jnp.int32, (P, 1), 0).astype(jnp.float32) - half_p
                    pos = ofs + k_s * its               # (P, 1)
                    iota_pb = jax.lax.broadcasted_iota(
                        jnp.int32, (P, bucket), 1).astype(jnp.float32)
                    k_t = jax.lax.broadcasted_iota(
                        jnp.int32, (1, P), 1).astype(jnp.float32) - half_p
                    pos_t = ofs + k_t * its             # (1, P)
                    iota_bp = jax.lax.broadcasted_iota(
                        jnp.int32, (bucket, P), 0).astype(jnp.float32)
                    iota_1b = jax.lax.broadcasted_iota(
                        jnp.int32, (1, bucket), 1).astype(jnp.float32)
                    iota_b1 = jax.lax.broadcasted_iota(
                        jnp.int32, (bucket, 1), 0).astype(jnp.float32)
                    R = jnp.zeros((P, bucket), jnp.float32)
                    RT = jnp.zeros((bucket, P), jnp.float32)
                    CL = jnp.zeros((1, bucket), jnp.float32)
                    CR = jnp.zeros((1, bucket), jnp.float32)
                    for t in range(KMAX):
                        tap = taps_ref[0, kb, t]
                        off = jnp.float32(t - r_blur)
                        R = R + tap * jnp.maximum(
                            0.0, 1.0 - jnp.abs(iota_pb - (pos + off)))
                        RT = RT + tap * jnp.maximum(
                            0.0, 1.0 - jnp.abs(iota_bp - (pos_t + off)))
                        # replicate-boundary mass: sources c with
                        # c + t - r < 0 fold into column 0; sources
                        # with c + t - r > ws - 1 fold into ws - 1
                        CL = CL + tap * (iota_1b < -off).astype(
                            jnp.float32)
                        CR = CR + tap * (iota_1b > wsm1f - off).astype(
                            jnp.float32)
                    # true-workspace clip: columns beyond ws - 1 hold
                    # replicated values whose mass belongs at ws - 1
                    inside = (iota_pb <= wsm1f).astype(jnp.float32)
                    R = R * inside
                    RT = RT * (iota_bp <= wsm1f).astype(jnp.float32)
                    S_hat = jnp.maximum(
                        0.0, 1.0 - jnp.abs(iota_pb - pos))  # (P, bucket)
                    corr_l = jnp.sum(S_hat * CL, axis=1,
                                     keepdims=True)          # (P, 1)
                    corr_r = jnp.sum(S_hat * CR, axis=1,
                                     keepdims=True)
                    R = (R
                         + corr_l * (iota_pb == 0.0
                                     ).astype(jnp.float32)
                         + corr_r * (iota_pb == wsm1f
                                     ).astype(jnp.float32))
                    # transposed-side corrections built in (bucket, P)
                    # orientation directly (Mosaic cannot reshape
                    # (P, 1) -> (1, P))
                    ST_hat = jnp.maximum(
                        0.0, 1.0 - jnp.abs(iota_bp - pos_t))
                    CL_c = jnp.zeros((bucket, 1), jnp.float32)
                    CR_c = jnp.zeros((bucket, 1), jnp.float32)
                    for t in range(KMAX):
                        tap = taps_ref[0, kb, t]
                        off = jnp.float32(t - r_blur)
                        CL_c = CL_c + tap * (iota_b1 < -off).astype(
                            jnp.float32)
                        CR_c = CR_c + tap * (
                            iota_b1 > wsm1f - off).astype(jnp.float32)
                    corr_l_t = jnp.sum(ST_hat * CL_c, axis=0,
                                       keepdims=True)        # (1, P)
                    corr_r_t = jnp.sum(ST_hat * CR_c, axis=0,
                                       keepdims=True)
                    RT = (RT
                          + (iota_bp == 0.0).astype(jnp.float32)
                          * corr_l_t
                          + (iota_bp == wsm1f).astype(jnp.float32)
                          * corr_r_t)
                    tpatch = jnp.dot(R, wsbuf[kb, 0:bucket, :],
                                     preferred_element_type=jnp.float32,
                                     precision=_HI)
                    patch_ref[kb] = jnp.dot(
                        tpatch, RT, preferred_element_type=jnp.float32,
                        precision=_HI)
                    bad_ref[0, 0, kb] = jnp.any(
                        badacc[kb] > 0.5).astype(jnp.int32)
                    return
                # blur accumulates through scratch refs with STATIC
                # slices (an unrolled KMAX-term value chain makes Mosaic
                # materialize every term — 64 MB at bucket 385)
                if _PROFILE == "noblur":
                    blurv[:] = wsbuf[kb, 0:bucket, :]   # profiling cut
                else:
                    padv[0:r_blur, :] = jnp.broadcast_to(
                        wsbuf[kb, 0:1, :], (r_blur, bucket))
                    padv[r_blur:r_blur + bucket, :] = wsbuf[kb, 0:bucket, :]
                    padv[r_blur + bucket:, :] = jnp.broadcast_to(
                        wsbuf[kb, bucket - 1:bucket, :], (r_blur, bucket))
                    blurv[:] = taps_ref[0, kb, 0] * padv[0:bucket, :]
                    for t in range(1, KMAX):
                        blurv[:] += (taps_ref[0, kb, t]
                                     * padv[t:t + bucket, :])
                    padh[:, 0:r_blur] = jnp.broadcast_to(
                        blurv[:, 0:1], (bucket, r_blur))
                    padh[:, r_blur:r_blur + bucket] = blurv[:]
                    padh[:, r_blur + bucket:] = jnp.broadcast_to(
                        blurv[:, bucket - 1:bucket], (bucket, r_blur))
                    blurv[:] = taps_ref[0, kb, 0] * padh[:, 0:bucket]
                    for t in range(1, KMAX):
                        blurv[:] += (taps_ref[0, kb, t]
                                     * padh[:, t:t + bucket])

                # subsample: patch = S @ blurred @ ST
                ofs = jnp.float32(ws >> 1)
                k_s = jax.lax.broadcasted_iota(
                    jnp.int32, (P, 1), 0).astype(jnp.float32) - half_p
                pos = ofs + k_s * its                   # (P, 1)
                S = jnp.maximum(0.0, 1.0 - jnp.abs(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (P, bucket), 1).astype(jnp.float32)
                    - pos))
                k_t = jax.lax.broadcasted_iota(
                    jnp.int32, (1, P), 1).astype(jnp.float32) - half_p
                pos_t = ofs + k_t * its                 # (1, P)
                ST = jnp.maximum(0.0, 1.0 - jnp.abs(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (bucket, P), 0).astype(jnp.float32)
                    - pos_t))
                tpatch = jnp.dot(S, blurv[:],
                                 preferred_element_type=jnp.float32,
                                 precision=_HI)
                patch_ref[kb] = jnp.dot(
                    tpatch, ST, preferred_element_type=jnp.float32,
                    precision=_HI)
                bad_ref[0, 0, kb] = jnp.any(
                    badacc[kb] > 0.5).astype(jnp.int32)

            @pl.when(act_ref[0, 0, kb] == 0)
            def _():
                patch_ref[kb] = jnp.zeros((P, P), jnp.float32)
                bad_ref[0, 0, kb] = 1

    return kernel


@functools.partial(jax.jit, static_argnames=("bucket", "cfg",
                                              "interpret"))
def patches_pallas(images: jnp.ndarray, bucket: int, act, img_idx, rb, cb,
                   ws, x, y, a11, a21, a22, its, taps, cfg: HesaffConfig,
                   interpret: bool = False):
    """Fused patch pipeline over K keypoints of one bucket group.

    images: (B, H, W) f32 (HBM; padded in-graph to (8,128) tiles);
    act/img_idx/ws: (K,) int32; rb/cb: (K,) int32 aligned window origins
    in (8-row, 128-col) block units (padding slots sanitized);
    x/y/a11/a21/a22/its:
    (K,) f32; taps: (K, KMAX) f32 per-keypoint normalized blur taps.
    K must be a multiple of the block.  Returns (patches (K, P, P),
    bad (K,) int32 — boundary-touched or padding).
    """
    B, H, W = images.shape
    K = act.shape[0]
    KB = _group_kb(bucket)
    assert K % KB == 0
    WY, WX, KMAX, LY, _, _ = group_geometry(
        bucket, H, W, cfg.patch_size, cfg.patch_smooth_factor)
    assert taps.shape[1] == KMAX
    P = cfg.patch_size
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    if Hp != H or Wp != W:
        images = jnp.pad(images, ((0, 0), (0, Hp - H), (0, Wp - W)))

    stride = bucket + KMAX - 1

    def scratch_for(pipe: bool, kb: int = None):
        kb = KB if kb is None else kb
        base = [
            pltpu.VMEM(((2, kb, WY, WX) if pipe else (kb, WY, WX)),
                       jnp.float32),                          # win
            pltpu.VMEM((kb, _round_up(bucket, _ROWS), bucket),
                       jnp.float32),                          # wsbuf
            pltpu.VMEM((kb, WY, bucket), jnp.float32),        # ysbuf
            pltpu.VMEM((kb, 1, bucket), jnp.float32),         # vxbuf
            pltpu.VMEM((kb, 1, bucket), jnp.float32),         # rowacc
            pltpu.VMEM((kb, 1, bucket), jnp.float32),         # badacc
        ]
        return base + [
            pltpu.VMEM((stride, bucket), jnp.float32),        # padv
            pltpu.VMEM((bucket, bucket), jnp.float32),        # blurv
            pltpu.VMEM((bucket, stride), jnp.float32),        # padh
        ]

    def vmem_bytes(shapes):
        total = 0
        for s in shapes:
            n = 1
            for d in s.shape:
                n *= d
            total += 4 * n
        return total

    # an env-raised block halves back down until the un-piped scratch
    # fits the measured scoped-VMEM budget (16.16 MB validated on chip;
    # see _group_kb).  Applies ONLY to HESAFF_PATCH_KB overrides —
    # default block sizes are the validated ones and keep their
    # geometry even where this estimate is pessimistic.  K stays a
    # multiple: KB is a power of two, so every halving divides the
    # caller's padding block.
    if os.environ.get("HESAFF_PATCH_KB", ""):
        while KB > 1 and vmem_bytes(scratch_for(False)) > 16_600_000:
            KB //= 2

    # double-buffered window prefetch only where the doubled scratch
    # still fits the 16 MB scoped-VMEM budget (derived from the actual
    # scratch list so the estimate cannot drift from the allocation)
    pipe = _DMA_PIPE and vmem_bytes(scratch_for(True)) <= 14_500_000
    kernel = _make_kernel(bucket, WY, WX, KMAX, LY, H, W, cfg, KB,
                          pipe=pipe)
    nsteps = K // KB
    grid = (nsteps,)
    # scalars ride as (G, 1, KB) blocks — trailing block dims equal the
    # array dims, the only blocked-SMEM layout Mosaic accepts
    sblk = lambda: pl.BlockSpec((1, 1, KB), lambda g: (g, 0, 0),
                                memory_space=pltpu.SMEM)
    # +1-shifted views: step g reads step g+1's DMA scalars (prefetch)
    nblk = lambda: pl.BlockSpec(
        (1, 1, KB), lambda g: (jnp.minimum(g + 1, nsteps - 1), 0, 0),
        memory_space=pltpu.SMEM)
    nxt_in = (img_idx, rb, cb, act) if pipe else ()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            sblk(),  # act
            sblk(),  # r0
            sblk(),  # c0
            sblk(),  # img_idx
            sblk(),  # ws
            sblk(),  # x
            sblk(),  # y
            sblk(),  # a11
            sblk(),  # a21
            sblk(),  # a22
            sblk(),  # its
            pl.BlockSpec((1, KB, KMAX), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),  # taps
        ] + [nblk() for _ in nxt_in] + [
            pl.BlockSpec(memory_space=pltpu.HBM),   # images
        ],
        out_specs=[
            pl.BlockSpec((KB, P, P), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, KB), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, P, P), jnp.float32),
            jax.ShapeDtypeStruct((K // KB, 1, KB), jnp.int32),
        ],
        scratch_shapes=scratch_for(pipe) + [
            pltpu.SemaphoreType.DMA((2, KB) if pipe else (KB,)),
        ],
        interpret=interpret,
    )(*(a.reshape(-1, 1, KB) for a in (act, rb, cb, img_idx, ws)),
      *(a.reshape(-1, 1, KB) for a in (x, y, a11, a21, a22, its)),
      taps.reshape(-1, KB, taps.shape[1]),
      *(a.reshape(-1, 1, KB) for a in nxt_in), images)


def extract_group_pallas(images: jnp.ndarray, bucket: int, img_idx,
                         x, y, s, a11, a21, a22, cfg: HesaffConfig,
                         active, true_hw=None, interpret: bool = False):
    """XLA-side wrapper: per-keypoint parameters + corner check + kernel.

    Mirrors patches.extract_bucket_batch for the blur branch (the
    caller routes direct-branch keypoints elsewhere).  Returns
    (patches (K, P, P), ok (K,)).
    """
    from hesaff_tpu.ops.warp import check_borders
    from hesaff_tpu.patches import _device_gauss_taps

    B, H, W = images.shape
    P = cfg.patch_size
    K = x.shape[0]
    WY, WX, KMAX, _, CY, CX = group_geometry(
        bucket, H, W, P, cfg.patch_smooth_factor)
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)

    mr_scale = jnp.ceil(s * cfg.mr_size)
    S = 2 * mr_scale.astype(jnp.int32) + 1
    its = S.astype(jnp.float32) / P
    ws = S + 2

    # true_hw: (B, 2) per-image TRUE dims for the boundary pre-check
    # (affine.cpp:112) when `images` is edge-padded to a shape bucket
    if true_hw is None:
        hk = jnp.full_like(img_idx, H)
        wk = jnp.full_like(img_idx, W)
    else:
        vhw = jnp.asarray(true_hw, jnp.int32)
        hk = vhw[img_idx, 0]
        wk = vhw[img_idx, 1]
    corner_bad = jax.vmap(
        lambda hh, wwk, itss, b11, b21, b22, xx, yy: check_borders(
            hh, wwk, P, P, xx, yy,
            b11 * itss, 0.0, b21 * itss, b22 * itss,
        )
    )(hk, wk, its, a11, a21, a22, x, y)

    sigma = cfg.patch_smooth_factor * its
    ksz = (2.0 * 3.0 * sigma + 1.0).astype(jnp.int32)
    ksz = ksz + 1 - (ksz % 2)
    taps = jax.vmap(
        lambda sg, kz: _device_gauss_taps(sg, kz, KMAX)
    )(sigma, ksz)

    # coverage origin per the validated CY/CX centering, then aligned
    # down to the (8, 128) tile for the DMA (margins in WY/WX cover it)
    r0 = jnp.clip(y.astype(jnp.int32) - CY // 2, 0, max(H - CY, 0))
    c0 = jnp.clip(x.astype(jnp.int32) - CX // 2, 0, max(W - CX, 0))
    rb = jnp.minimum(r0 // 8, (Hp - WY) // 8)
    cb = jnp.minimum(c0 // 128, (Wp - WX) // 128)
    act = active.astype(jnp.int32)
    img = jnp.where(active, img_idx, 0)
    rb = jnp.where(active, rb, 0)
    cb = jnp.where(active, cb, 0)
    ws_s = jnp.where(active, ws, 3)

    KB = _group_kb(bucket)
    pad = (-K) % KB
    if pad:
        padded = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        act, img, rb, cb, ws_s = map(padded, (act, img, rb, cb, ws_s))
        x, y, a11, a21, a22, its = map(padded, (x, y, a11, a21, a22, its))
        taps = padded(taps)

    patches, bad = patches_pallas(
        images, bucket, act, img, rb, cb, ws_s, x, y, a11, a21, a22,
        its, taps, cfg, interpret=interpret,
    )
    bad = bad.reshape(-1)
    sl = slice(0, K)
    ok = active & ~corner_bad & (bad[sl] == 0)
    return patches[sl], ok


def extract_group_pallas_scaled(images_src: jnp.ndarray, ps: float,
                                bucket: int, img_idx, x, y, s,
                                a11, a21, a22, cfg: HesaffConfig,
                                active, orig_hw, true_hw=None,
                                interpret: bool = False):
    """Patch pipeline for LARGE patches from a downsampled pyramid level.

    images_src: (B, H/ps, W/ps) first level of pyramid octave
    log2(ps·[2 if upscale]) — sigma0-blurred in its own pixels;
    ps: source pixel distance (original px per source px, power of 2).

    Mirrors the reference pipeline (affine.cpp:102-144) in source
    coordinates: the det-1 warp shrinks by ps, the subsample step is
    its/ps, and the anti-alias sigma subtracts the blur the level
    already carries: sigma_add = sqrt((f·its/ps)² − sigma0²) — the
    Gaussian-composition identity (SURVEY.md §7 hard-part 1 option (b);
    valid when f·its > ps·sigma0, i.e. workspaces > ~2.2·ps·sigma0·P/f).
    The boundary pre-check stays in ORIGINAL coordinates/dims so
    acceptance matches the full-resolution path.

    Returns (patches (K, P, P), ok (K,)).
    """
    from hesaff_tpu.ops.warp import check_borders
    from hesaff_tpu.patches import _device_gauss_taps

    B, Hs, Ws = images_src.shape
    Ho, Wo = orig_hw
    P = cfg.patch_size
    K = x.shape[0]
    WY, WX, KMAX, _, CY, CX = group_geometry(
        bucket, Hs, Ws, P, cfg.patch_smooth_factor)

    mr_scale = jnp.ceil(s * cfg.mr_size)
    S = 2 * mr_scale.astype(jnp.int32) + 1         # original-res extent
    its = S.astype(jnp.float32) / P                # original-res step
    its_src = its / ps
    # odd source workspace covering S/ps plus the +2 bilinear margin
    ws_src = 2 * jnp.ceil(S.astype(jnp.float32) / (2.0 * ps)) \
        .astype(jnp.int32) + 3

    # acceptance in ORIGINAL coordinates (affine.cpp:112 semantics);
    # true_hw: per-image TRUE dims when padded (mixed-size fleets)
    if true_hw is None:
        hk = jnp.full_like(img_idx, Ho)
        wk = jnp.full_like(img_idx, Wo)
    else:
        vhw = jnp.asarray(true_hw, jnp.int32)
        hk = vhw[img_idx, 0]
        wk = vhw[img_idx, 1]
    corner_bad = jax.vmap(
        lambda hh, wwk, itss, b11, b21, b22, xx, yy: check_borders(
            hh, wwk, P, P, xx, yy,
            b11 * itss, 0.0, b21 * itss, b22 * itss,
        )
    )(hk, wk, its, a11, a21, a22, x, y)

    sigma0 = cfg.initial_sigma
    var = jnp.maximum(
        (cfg.patch_smooth_factor * its_src) ** 2 - sigma0 * sigma0,
        1e-4,
    )
    sigma = jnp.sqrt(var)
    ksz = (2.0 * 3.0 * sigma + 1.0).astype(jnp.int32)
    ksz = ksz + 1 - (ksz % 2)
    taps = jax.vmap(
        lambda sg, kz: _device_gauss_taps(sg, kz, KMAX)
    )(sigma, ksz)

    xs = x / ps
    ys = y / ps
    # coverage origin (clip(center - CY/2)) at source resolution, then
    # tile-aligned for the DMA — same scheme as extract_group_pallas
    r0 = jnp.clip(ys.astype(jnp.int32) - CY // 2, 0, max(Hs - CY, 0))
    c0 = jnp.clip(xs.astype(jnp.int32) - CX // 2, 0, max(Ws - CX, 0))
    rb = jnp.minimum(r0 // 8, (_round_up(Hs, 8) - WY) // 8)
    cb = jnp.minimum(c0 // 128, (_round_up(Ws, 128) - WX) // 128)
    act = active.astype(jnp.int32)
    img = jnp.where(active, img_idx, 0)
    rb = jnp.where(active, rb, 0)
    cb = jnp.where(active, cb, 0)
    ws_s = jnp.where(active, ws_src, 3)

    KB = _group_kb(bucket)
    pad = (-K) % KB
    if pad:
        padded = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        act, img, rb, cb, ws_s = map(padded, (act, img, rb, cb, ws_s))
        xs, ys, a11, a21, a22 = map(padded, (xs, ys, a11, a21, a22))
        its_src = padded(its_src)
        taps = padded(taps)

    patches, bad = patches_pallas(
        images_src, bucket, act, img, rb, cb, ws_s, xs, ys,
        a11, a21, a22, its_src, taps, cfg, interpret=interpret,
    )
    bad = bad.reshape(-1)
    sl = slice(0, K)
    ok = active & ~corner_bad & (bad[sl] == 0)
    return patches[sl], ok
