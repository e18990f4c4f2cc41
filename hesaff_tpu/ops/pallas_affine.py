"""Pallas TPU kernel: fused Baumberg affine-shape adaptation.

The XLA path (affine_shape._adapt_one) re-samples a 19x19 window per
iteration via one-hot matmuls whose (361, win) one-hot operands stream
through HBM every iteration — ~350 ms of a batch-16 run.  This kernel
keeps each keypoint's sampling window resident in VMEM and runs the
whole <=16-iteration loop in-kernel: HBM traffic drops to one window
read per keypoint, and the loop exits early once the keypoint
converges or diverges.

Semantics mirror affine_shape._adapt_one (same one-hot bilinear
weights, same SMM/invSqrt/eigen decision chain against
/root/reference/affine.cpp:35-100).  Sampling runs as bf16x3 matmuls
(~2^-22 rel of f32) and the (361,1)->(19,19) fold as a bf16x2
RHS-split (~2^-16 rel; each output has exactly one nonzero term), so
SMM inputs carry ~1e-6 relative error vs the XLA path — keypoints
sitting exactly on a convergence/anisotropy threshold can in principle
flip ok/iters between the two paths (none do on the checked-in test
seeds, which assert exact agreement).

Layout trick: sampled values come out of the MXU as a (361, 1) column;
the gradient/SMM stage wants (19, 19).  The fold is itself a pair of
constant one-hot matmuls:  img(j,i) = sum_p AJ(j,p) * val(p) * BI(p,i)
with AJ(j,p) = [p//19 == j], BI(p,i) = [p%19 == i] — avoiding an
unsupported cross-lane reshape.

DMA alignment: Mosaic requires dynamic HBM slice origins PROVABLY
divisible by the (8, 128) tile — so the kernel receives origins as
(row/8, col/128) block counts and copies an aligned superset window
(semantic window rounded out to tile boundaries).  The out-of-window
observability check still uses the semantic window so results match
the XLA path bit-for-bit.

Lane economy: the DMA'd superset carries up to 127 alignment-margin
columns, but the sampling one-hot only needs the WIN (<=120) semantic
columns — so each keypoint's window is dynamically lane-rolled
(pltpu.roll) to put the semantic origin at (or within coverage slack
of) lane 0 and sliced to round_up(WIN, 128) lanes before the loop.
Coverage proof: uncapped origins land exactly (shift < 128); capped
origins satisfy c128 = Wp - WINX >= c0 + WIN - XL since c0 + WIN <= W.
This halves both the per-iteration VPU one-hot work and the MXU
sampling contraction.  One-hot weights use the hat identity
max(0, 1 - |e - f|) == select(e==0, 1-f, e==1 -> f, 0) for integer
lane offsets e — bit-exact with the select form: every intermediate
(wy - r8f, iota - x, 1 - frac) is an exact f32 operation because all
operands are multiples of one scale with sums below 2^24.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.ops.pallas_util import dma_plumbing as _dma_plumbing
from hesaff_tpu.ops.pallas_util import dot_onehot_bf16x2
from hesaff_tpu.ops.pallas_util import round_up as _round_up

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.linalg import eigenvalues_2x2, inv_sqrt_2x2

# keypoints per grid step (window scratch = KB * WINY * WINX * 4 bytes;
# env-tunable for on-chip sweeps)
_KB = int(os.environ.get("HESAFF_AFFINE_KB", "8"))

# narrow the window with a dynamic lane roll (cheap) vs an exact 0/1
# select matmul (fallback if tpu.DynamicRotate fails to lower)
_USE_ROLL = os.environ.get("HESAFF_AFFINE_NO_ROLL", "0") != "1"

# (A lockstep variant — one while_loop advancing KB keypoints with
# masked updates, plus an N-phase compacting driver — lived here
# through round 3.  The on-chip A/B measured 49.2k vs 52.7k desc/s for
# the per-keypoint early-exit loops below: lockstep's extra masked
# iterations and the phase recompaction cost more than the straggler
# idling they saved.  Deleted per the sweep record in PERF.md.)

# (TWO loop-amortization variants were built and measured on chip in
# round 5 and BOTH LOST — the affine stage is op-issue-bound, not
# sync-bound:
#  * KB-packed loop (one while_loop advancing 8 keypoints with masked
#    freezes): 53.8k vs 58.3k desc/s — straggler iterations in a pack
#    cost more than the shared cond sync saves.  A sublane-stacked
#    (KB, 1) state variant additionally collided with Mosaic's sublane
#    concat/slice emulation.
#  * K-wide iteration unrolling of the per-keypoint loop (sync paid
#    once per K masked iterations, no cross-keypoint coupling):
#    unroll4 71.2k vs 75.4k — the masked-iteration waste again beat
#    the sync saving.
# Both deleted per the sweep record in PERF.md r5; what DID win is the
# transposed sample layout below.)

# Transposed sample layout: put the 361 SMM sample points on LANES
# instead of sublane rows.  The original kernel's per-sample math runs
# on (N, 1) columns — 46 vregs at 1/128 lane utilization — and its
# sampling matmul contracts over K=WINY=27 (a fifth of the MXU's
# native depth).  Transposed, the coordinate math is (1, N) rows
# (3 vregs), the hat operands are (WINY, N)/(XL, N), and the sampling
# matmul becomes (WINY, XL) @ (XL, N) with K=128.  The KB-packed A/B
# (lost, r5) localized the affine cost in per-iteration op issue, not
# the loop sync — this attacks exactly that term.
_TRANSPOSED = os.environ.get("HESAFF_AFFINE_T", "1") == "1"

# Lane-layout gradients (transposed path only): the (361,1)->(19,19)
# fold exists ONLY to feed the gradient stencils, but a neighbor
# difference in the 19x19 grid is a +-1 / +-19 LANE shift of the (1, N)
# sample row — so compute gx/gy directly on lanes (pad + slice shifts,
# constant edge masks select the one-sided forms) and reduce the SMM
# sums over the flattened mask row.  Drops both fold matmuls, the
# val/AJ bf16 splits, and six sublane-dim concats from every Baumberg
# iteration; arithmetic is the identical f32 subtraction chain
# (affine.cpp:14-33), only the reduction order of the mask sums moves.
# Default ON: on-chip A/B measured 86.1k vs 78-80k desc/s compute probe
# (+8%, tools/sweeps/r5_matrix7.log).
# (A double-width selection-matmul variant — both x0/x0+1 one-hot
# selectors in one lane-aligned (XL, 2*NP) operand, halving MXU issues
# — was built and measured on top of this: 85.7k vs 86.1k, no gain
# over lane-grad alone; deleted per the sweep record.)
_LANE_GRAD = os.environ.get("HESAFF_AFFINE_LANE_GRAD", "1") == "1"

# cross-grid-step DMA double buffering: prefetch the NEXT block's
# windows (scalars via a +1-shifted BlockSpec view of src/rb/cb/act)
# while computing the current block, hiding window-DMA latency behind
# the iteration loop.  Scratch doubles: (2, KB, WINY, WINX).
# Default ON: the round-3 on-chip A/B measured +11% end-to-end
# (47.4k -> 52.7k desc/s with both DMA pipes).
_DMA_PIPE = os.environ.get("HESAFF_AFFINE_DMA_PIPE", "1") == "1"

# PROFILING ONLY (breaks output parity): "prologue" truncates the
# per-keypoint kernel after DMA + roll + bf16 split, attributing the
# stage time between window setup and the iteration loop.
_PROFILE = os.environ.get("HESAFF_AFFINE_PROFILE", "")


def aligned_window(win: int) -> tuple[int, int]:
    """(WINY, WINX) of the tile-aligned DMA superset of a win^2 window.

    Row origin aligns down to 8 (<=7 extra rows), col origin to 128
    (<=127 extra cols); margins guarantee the semantic window is
    covered wherever the origin lands.
    """
    return win + 8, _round_up(win, 128) + 128


def _grid_constants(win_grid: int):
    """Constant fold/index matrices for the (361,1)->(19,19) layout."""
    n = win_grid * win_grid
    p = np.arange(n)
    aj = (p[None, :] // win_grid == np.arange(win_grid)[:, None])
    bi = (p[:, None] % win_grid == np.arange(win_grid)[None, :])
    return aj.astype(np.float32), bi.astype(np.float32)


def _make_kernel(WIN: int, H: int, W: int, cfg: HesaffConfig, KB: int,
                 pipe: bool = False):
    G = cfg.smm_window_size          # 19
    N = G * G                        # 361
    half = G >> 1
    mask_pixels = float(N)
    WINY, WINX = aligned_window(WIN)
    XL = _round_up(WIN, 128)         # rolled window lane extent

    def kernel(*refs):
        (src_ref, rb_ref, cb_ref, act_ref, lx_ref, ly_ref, ratio_ref,
         *rest) = refs
        next_scalars = None
        if pipe:
            next_scalars, rest = tuple(rest[:4]), rest[4:]
        (stack_ref, mask_ref, aj_ref, bi_ref,
         ok_ref, u11_ref, u12_ref, u21_ref, u22_ref, iters_ref,
         wnd, sems) = rest
        start_cur, start_nxt, wait_cur, window_of = _dma_plumbing(
            stack_ref, wnd, sems, WINY, WINX, pipe, KB, next_scalars)

        start_cur(src_ref, rb_ref, cb_ref, act_ref)
        start_nxt()

        if _TRANSPOSED:
            # sample index p rides on LANES: coordinate math is (1, N)
            # rows, hat operands (WINY, N)/(XL, N)
            p_row = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            jj = p_row // G
            j_col = (jj - half).astype(jnp.float32)        # (1, N)
            i_col = (p_row - jj * G - half).astype(jnp.float32)
            iota_y = jax.lax.broadcasted_iota(
                jnp.int32, (WINY, N), 0).astype(jnp.float32)
            iota_x = jax.lax.broadcasted_iota(
                jnp.int32, (XL, N), 0).astype(jnp.float32)
            if _LANE_GRAD:
                # loop-invariant grid-edge masks for the lane-layout
                # gradient stencils (i==0 / i==G-1 / j==0 / j==G-1)
                hf = jnp.float32(half)
                ix_lo = i_col == -hf
                ix_hi = i_col == hf
                jx_lo = j_col == -hf
                jx_hi = j_col == hf
        else:
            # constant (N, 1) columns: sample index p -> (j, i) in the
            # 19x19 affine grid (broadcast against the lane iotas)
            p_col = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
            jj = p_col // G
            j_col = (jj - half).astype(jnp.float32)
            i_col = (p_col - jj * G - half).astype(jnp.float32)
            iota_y = jax.lax.broadcasted_iota(
                jnp.int32, (N, WINY), 1).astype(jnp.float32)
            iota_x = jax.lax.broadcasted_iota(
                jnp.int32, (N, XL), 1).astype(jnp.float32)

        for kb in range(KB):
            @pl.when(act_ref[0, 0, kb] != 0)
            def _():
                wait_cur(kb, src_ref, rb_ref, cb_ref)
                lx = lx_ref[0, 0, kb]
                ly = ly_ref[0, 0, kb]
                ratio = ratio_ref[0, 0, kb]
                r8f = jnp.float32(rb_ref[0, 0, kb] * 8)
                # semantic window origin (the XLA path's clip)
                r0o = jnp.float32(jnp.clip(
                    ly.astype(jnp.int32) - WIN // 2, 0, H - WIN))
                c0i = jnp.clip(lx.astype(jnp.int32) - WIN // 2, 0, W - WIN)
                c0o = jnp.float32(c0i)
                # roll the semantic origin to lane 0 (clamped so the XL
                # slice never crosses the rolled wrap; see module doc)
                shift = jnp.minimum(c0i - cb_ref[0, 0, kb] * 128,
                                    WINX - XL)
                if _USE_ROLL:
                    wr = pltpu.roll(window_of(kb), -shift, axis=1)[:, :XL]
                else:
                    # exact narrowing via 0/1 select matmul: HIGHEST's
                    # bf16x6 reconstructs each f32 exactly under a
                    # permutation operand (all partial chunk sums are
                    # representable)
                    sel = (jax.lax.broadcasted_iota(
                               jnp.int32, (WINX, XL), 0)
                           == jax.lax.broadcasted_iota(
                               jnp.int32, (WINX, XL), 1) + shift
                           ).astype(jnp.float32)
                    wr = jnp.dot(window_of(kb), sel,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                corig = jnp.float32(cb_ref[0, 0, kb] * 128 + shift)
                # loop-invariant bf16 split of the window (the "b" side
                # of the bf16x3 sampling matmul)
                wh = wr.astype(jnp.bfloat16)
                wl = (wr - wh.astype(jnp.float32)).astype(jnp.bfloat16)

                if _PROFILE == "prologue":
                    # profiling cut: consume the split so it isn't dead,
                    # skip the iteration loop entirely
                    ok_ref[0, 0, kb] = (
                        jnp.sum(wh.astype(jnp.float32))
                        + jnp.sum(wl.astype(jnp.float32)) > 1e30
                    ).astype(jnp.int32)
                    u11_ref[0, 0, kb] = 0.0
                    u12_ref[0, 0, kb] = 0.0
                    u21_ref[0, 0, kb] = 0.0
                    u22_ref[0, 0, kb] = 0.0
                    iters_ref[0, 0, kb] = 0
                    return

                # the iteration state lives as (1, 1) VECTOR values: the
                # SMM reductions keep dims, invSqrt/eigen run as (1, 1)
                # elementwise ops, and only the loop condition reduces
                # to the scalar core — one vector->scalar sync per
                # iteration instead of one per reduction/branch (the
                # scalar<->vector ping-pong dominated iteration latency)
                ratio_v = jnp.full((1, 1), ratio)

                # mask carries ride as i32 0/1 vectors: Mosaic (current
                # libtpu) fails to legalize scf.yield of vector<i1>
                # loop carries ("failed to legalize operation
                # 'scf.yield'"), so booleans only live inside the body
                def cond(state):
                    (_, _, _, _, _, alive, _, _, _, it) = state
                    return jnp.any(alive != 0) & (it < cfg.max_iterations)

                def core(u11, u12, u21, u22, ratio_bef):
                    a11r = u11 * ratio_v
                    a12r = u12 * ratio_v
                    a21r = u21 * ratio_v
                    a22r = u22 * ratio_v

                    def d(p, q):
                        return jax.lax.dot_general(
                            p, q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    # per-sample warp coordinates: (1, N) rows in the
                    # transposed layout, (N, 1) columns otherwise
                    wy = ly + i_col * a21r + j_col * a22r
                    wx = lx + i_col * a11r + j_col * a12r
                    y0f = jnp.floor(wy)
                    x0f = jnp.floor(wx)
                    # samples outside the image produce 0 (reference
                    # semantics helpers.cpp:229-239; the flag is ignored
                    # by findAffineShape, affine.cpp:47) — mask Ex so
                    # near-border floor indices don't alias into the
                    # window through the relative one-hot
                    validf = ((x0f >= 0) & (x0f < W - 1)
                              & (y0f >= 0)
                              & (y0f < H - 1)).astype(jnp.float32)
                    if _TRANSPOSED:
                        # hats with the sample axis on lanes
                        Eyt = jnp.maximum(
                            0.0, 1.0 - jnp.abs(iota_y - (wy - r8f)))
                        # x side: EXACT one-hot column selection + f32
                        # fractional blend.  The bilinear hat factors as
                        # (1-fx) d_x0 + fx d_x0+1; selecting w's columns
                        # with exact 0/1 one-hots (2 bf16 passes each —
                        # the split rides on the precomputed wh/wl) and
                        # blending in f32 replaces the per-iteration
                        # f32 hat build + bf16 split of the (XL, N)
                        # operand, and is MORE accurate (only w's own
                        # 2^-16 split error remains).  OOB mask folds
                        # into the (1, N) coordinate: a far coordinate
                        # zeroes both one-hot columns exactly.
                        x0m = jnp.where(validf > 0, x0f - corig,
                                        jnp.float32(-1e6))
                        fx = wx - x0f                    # (1, N) exact
                        X0 = jnp.where(iota_x == x0m, 1.0, 0.0
                                       ).astype(jnp.bfloat16)
                        X1 = jnp.where(iota_x == x0m + 1.0, 1.0, 0.0
                                       ).astype(jnp.bfloat16)
                        q0 = d(wh, X0) + d(wl, X0)       # (WINY, N)
                        q1 = d(wh, X1) + d(wl, X1)
                        q = q0 * (1.0 - fx) + q1 * fx
                        val = jnp.sum(Eyt * q, axis=0,
                                      keepdims=True)     # (1, N)
                        if not _LANE_GRAD:
                            # fold via LHS split: AJ is 0/1, so
                            # AJ*val_hi is exactly bf16-valued; same
                            # 2-pass class as dot_onehot_bf16x2
                            vh = val.astype(jnp.bfloat16)
                            vl = val - vh.astype(jnp.float32)
                            ajh = (aj_ref[:] * vh.astype(jnp.float32)
                                   ).astype(jnp.bfloat16)
                            ajl = (aj_ref[:] * vl).astype(jnp.bfloat16)
                            bib = bi_ref[:].astype(jnp.bfloat16)
                            img = d(ajh, bib) + d(ajl, bib)
                    else:
                        # hat-identity bilinear one-hots over lane iotas
                        Ey = jnp.maximum(
                            0.0, 1.0 - jnp.abs(iota_y - (wy - r8f)))
                        Ex = jnp.maximum(
                            0.0, 1.0 - jnp.abs(iota_x - (wx - corig))
                        ) * validf
                        # bf16x3 sampling matmul: near-f32 accuracy at
                        # half the MXU passes of Mosaic's HIGHEST
                        eh = Ey.astype(jnp.bfloat16)
                        el = (Ey - eh.astype(jnp.float32)
                              ).astype(jnp.bfloat16)
                        t = d(eh, wh) + d(eh, wl) + d(el, wh)
                        val = jnp.sum(t * Ex, axis=1,
                                      keepdims=True)     # (N, 1)
                        # aj is 0/1: the (361,1)->(19,19) fold needs
                        # only a 2-pass RHS-split matmul (each output
                        # has exactly one nonzero term; ~2^-16 rel)
                        img = dot_onehot_bf16x2(aj_ref[:],
                                                val * bi_ref[:])

                    # out-of-window observability (sample inside image
                    # but outside the SEMANTIC window — matches the XLA
                    # path; the DMA'd superset is strictly larger)
                    ow = ((y0f - r0o < 0) | (y0f - r0o > WIN - 2)
                          | (x0f - c0o < 0) | (x0f - c0o > WIN - 2))
                    ow_any = jnp.any((validf > 0) & ow,
                                     keepdims=True).reshape(1, 1)

                    # gradients: central diffs, one-sided at edges,
                    # NOT halved (affine.cpp:14-33)
                    if _TRANSPOSED and _LANE_GRAD:
                        # neighbor diffs in the 19x19 grid are +-1 /
                        # +-G lane shifts of the (1, N) row; the
                        # one-sided edge forms never read a shifted-in
                        # filler (selected away by the edge masks)
                        z1 = jnp.zeros((1, 1), jnp.float32)
                        zg = jnp.zeros((1, G), jnp.float32)
                        vp1 = jnp.concatenate([val[:, 1:], z1], axis=1)
                        vm1 = jnp.concatenate([z1, val[:, :-1]], axis=1)
                        vpg = jnp.concatenate([val[:, G:], zg], axis=1)
                        vmg = jnp.concatenate([zg, val[:, :-G]], axis=1)
                        gx = jnp.where(
                            ix_lo, vp1 - val,
                            jnp.where(ix_hi, val - vm1, vp1 - vm1))
                        gy = jnp.where(
                            jx_lo, vpg - val,
                            jnp.where(jx_hi, val - vmg, vpg - vmg))
                    else:
                        gx = jnp.concatenate(
                            [img[:, 1:2] - img[:, 0:1],
                             img[:, 2:] - img[:, :-2],
                             img[:, -1:] - img[:, -2:-1]], axis=1)
                        gy = jnp.concatenate(
                            [img[1:2, :] - img[0:1, :],
                             img[2:, :] - img[:-2, :],
                             img[-1:, :] - img[-2:-1, :]], axis=0)
                    msk = mask_ref[:]
                    sum11 = lambda z: jnp.sum(z, axis=(0, 1),
                                              keepdims=True)
                    a = sum11(gx * gx * msk) / mask_pixels
                    b = sum11(gx * gy * msk) / mask_pixels
                    c = sum11(gy * gy * msk) / mask_pixels

                    ia, ib, ic, il1, il2 = inv_sqrt_2x2(a, b, c)
                    ratio_act = 1.0 - il2 / il1

                    n11 = ia * u11 + ib * u21
                    n12 = ia * u12 + ib * u22
                    n21 = ib * u11 + ic * u21
                    n22 = ib * u12 + ic * u22

                    l1, l2, is_real = eigenvalues_2x2(n11, n12, n21, n22)
                    aniso_bad = ((~is_real)
                                 | (l1 / l2 > cfg.anisotropy_max)
                                 | (l2 / l1 > cfg.anisotropy_max))
                    just_conv = ((ratio_act < cfg.convergence_threshold)
                                 & (ratio_bef < cfg.convergence_threshold)
                                 & ~aniso_bad)
                    return (n11, n12, n21, n22, ratio_act, ow_any,
                            aniso_bad, just_conv)

                def body(state):
                    (u11, u12, u21, u22, ratio_bef, alive_i, converged_i,
                     conv_iter, violated_i, it) = state
                    alive = alive_i != 0
                    converged = converged_i != 0
                    violated = violated_i != 0
                    (n11, n12, n21, n22, ratio_act, ow_any,
                     aniso_bad, just_conv) = core(
                        u11, u12, u21, u22, ratio_bef)
                    violated = violated | (alive & ow_any)
                    conv_iter = jnp.where(just_conv, it, conv_iter)
                    converged = converged | just_conv
                    alive = alive & ~aniso_bad & ~just_conv
                    return (n11, n12, n21, n22, ratio_act,
                            alive.astype(jnp.int32),
                            converged.astype(jnp.int32),
                            conv_iter,
                            violated.astype(jnp.int32), it + 1)

                one = jnp.ones((1, 1), jnp.float32)
                zero = jnp.zeros((1, 1), jnp.float32)
                init = (one, zero, zero, one, zero,
                        jnp.ones((1, 1), jnp.int32),
                        jnp.zeros((1, 1), jnp.int32),
                        jnp.zeros((1, 1), jnp.int32),
                        jnp.zeros((1, 1), jnp.int32), jnp.int32(0))
                (u11, u12, u21, u22, _, _, converged, conv_iter,
                 violated, _) = jax.lax.while_loop(cond, body, init)
                ok_ref[0, 0, kb] = jnp.any(
                    (converged != 0) & (violated == 0)).astype(jnp.int32)
                u11_ref[0, 0, kb] = jnp.sum(u11)
                u12_ref[0, 0, kb] = jnp.sum(u12)
                u21_ref[0, 0, kb] = jnp.sum(u21)
                u22_ref[0, 0, kb] = jnp.sum(u22)
                iters_ref[0, 0, kb] = jnp.sum(conv_iter)

            @pl.when(act_ref[0, 0, kb] == 0)
            def _():
                ok_ref[0, 0, kb] = 0
                u11_ref[0, 0, kb] = 0.0
                u12_ref[0, 0, kb] = 0.0
                u21_ref[0, 0, kb] = 0.0
                u22_ref[0, 0, kb] = 0.0
                iters_ref[0, 0, kb] = 0

    return kernel


def _call_kernel(stack, src, rb, cb, act, lx, ly, ratio, win, H, W,
                 cfg: HesaffConfig, interpret: bool):
    """Invoke the fused kernel over K keypoints (K % _KB == 0).

    Returns (ok, u11, u12, u21, u22, iters).
    """
    S, Hp, Wp = stack.shape
    K = src.shape[0]
    assert K % _KB == 0
    G = cfg.smm_window_size
    aj, bi = _grid_constants(G)
    from hesaff_tpu.ops import masks
    msk = jnp.asarray(masks.smm_gauss_mask(G))
    if _TRANSPOSED and _LANE_GRAD:
        # lane-layout gradient path reduces over the flattened mask row
        msk = msk.reshape(1, G * G)
    WINY, WINX = aligned_window(win)
    # double-buffered prefetch only where the doubled window scratch
    # fits the measured scoped-VMEM budget (an HESAFF_AFFINE_KB raise
    # must degrade to single-buffering, not fail to compile)
    pipe = _DMA_PIPE and 2 * _KB * WINY * WINX * 4 <= 14_500_000
    kernel = _make_kernel(win, H, W, cfg, _KB, pipe=pipe)
    n_out = 6
    nsteps = K // _KB
    grid = (nsteps,)
    # scalars ride as (G, 1, KB) blocks — trailing block dims equal the
    # array dims, the only blocked-SMEM layout Mosaic accepts
    blk = lambda: pl.BlockSpec((1, 1, _KB), lambda g: (g, 0, 0),
                               memory_space=pltpu.SMEM)
    # +1-shifted view of the same array: step g sees step g+1's scalars
    # (DMA prefetch operands for the double-buffered window pipeline)
    blk_next = lambda: pl.BlockSpec(
        (1, 1, _KB), lambda g: (jnp.minimum(g + 1, nsteps - 1), 0, 0),
        memory_space=pltpu.SMEM)
    out_blk = pl.BlockSpec((1, 1, _KB), lambda g: (g, 0, 0),
                           memory_space=pltpu.SMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    out_dtypes = [i32, f32, f32, f32, f32, i32]
    n_next = 4 if pipe else 0
    wnd_shape = ((2, _KB, WINY, WINX) if pipe else (_KB, WINY, WINX))
    sem_shape = ((2, _KB) if pipe else (_KB,))
    blocked = (src, rb, cb, act, lx, ly, ratio)
    nxt_in = (src, rb, cb, act) if pipe else ()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk() for _ in range(7)]
        + [blk_next() for _ in range(n_next)] + [
            pl.BlockSpec(memory_space=pltpu.HBM),    # stack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aj
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bi
        ],
        out_specs=[out_blk] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM(wnd_shape, jnp.float32),
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
        interpret=interpret,
    )(*(a.reshape(-1, 1, _KB) for a in blocked),
      *(a.reshape(-1, 1, _KB) for a in nxt_in),
      stack, msk, jnp.asarray(aj), jnp.asarray(bi))


def pallas_window_fits(cfg: HesaffConfig, height: int, width: int) -> bool:
    """True if the aligned DMA superset window fits the (padded) octave."""
    from hesaff_tpu.affine_shape import unclamped_window_size

    win = unclamped_window_size(cfg)
    winy, winx = aligned_window(win)
    return (_round_up(height, 8) >= winy
            and _round_up(width, 128) >= winx)


@functools.partial(
    jax.jit,
    static_argnames=("pixel_distance", "cfg", "interpret"))
def adapt_flat_pallas(blur_stacks: jnp.ndarray, img_idx, src_level,
                      x, y, s, pixel_distance: float, cfg: HesaffConfig,
                      active=None, interpret: bool = False):
    """Drop-in fused-kernel variant of affine_shape.adapt_flat.

    Requires pallas_window_fits (callers fall back to the XLA path on
    small octaves).
    """
    from hesaff_tpu.affine_shape import AffineResult, sample_window_size

    B, L, H, W = blur_stacks.shape
    win = sample_window_size(cfg, H, W)
    WINY, WINX = aligned_window(win)
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    pd = jnp.float32(pixel_distance)
    K = x.shape[0]
    if active is None:
        active = jnp.ones((K,), bool)

    lx = x / pd
    ly = y / pd
    ratio = s / (cfg.initial_sigma * pd)
    src = (img_idx * L + src_level).astype(jnp.int32)
    r0 = jnp.clip(ly.astype(jnp.int32) - win // 2, 0, H - win)
    c0 = jnp.clip(lx.astype(jnp.int32) - win // 2, 0, W - win)
    # aligned superset origins, in tile-block units (provable alignment)
    rb = jnp.minimum(r0 // 8, (Hp - WINY) // 8)
    cb = jnp.minimum(c0 // 128, (Wp - WINX) // 128)
    act = active.astype(jnp.int32)
    src = jnp.where(active, src, 0)
    rb = jnp.where(active, rb, 0)
    cb = jnp.where(active, cb, 0)

    pad = (-K) % _KB
    if pad:
        zi = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,), a.dtype)])
        src, rb, cb, act = map(zi, (src, rb, cb, act))
        lx, ly, ratio = map(zi, (lx, ly, ratio))

    flat = blur_stacks.reshape(B * L, H, W)
    if Hp != H or Wp != W:
        flat = jnp.pad(flat, ((0, 0), (0, Hp - H), (0, Wp - W)))
    outs = _call_kernel(
        flat, src, rb, cb, act, lx, ly, ratio, win, H, W, cfg,
        interpret=interpret,
    )
    ok, u11, u12, u21, u22, iters = (o.reshape(-1) for o in outs)
    sl = slice(0, K)
    return AffineResult(
        ok=ok[sl].astype(bool), u11=u11[sl], u12=u12[sl],
        u21=u21[sl], u22=u22[sl], iters=iters[sl],
    )
