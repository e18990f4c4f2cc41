"""Pallas TPU kernel: fused Baumberg affine-shape adaptation.

The XLA path (affine_shape._adapt_one) re-samples a 19x19 window per
iteration via one-hot matmuls whose (361, win) one-hot operands stream
through HBM every iteration — ~350 ms of a batch-16 run.  This kernel
keeps each keypoint's sampling window resident in VMEM and runs the
whole <=16-iteration loop in-kernel: HBM traffic drops to one window
read per keypoint, and the loop exits early once the keypoint
converges or diverges.

Semantics mirror affine_shape._adapt_one exactly (same one-hot
bilinear weights, same SMM/invSqrt/eigen decision chain against
/root/reference/affine.cpp:35-100); math runs in full f32.

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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.linalg import eigenvalues_2x2, inv_sqrt_2x2
from hesaff_tpu.ops.pallas_util import dot_bf16x3

# keypoints per grid step (window scratch = KB * WINY * WINX * 4 bytes)
_KB = 8


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


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


def _make_kernel(WIN: int, H: int, W: int, cfg: HesaffConfig, KB: int):
    G = cfg.smm_window_size          # 19
    N = G * G                        # 361
    half = G >> 1
    mask_pixels = float(N)
    WINY, WINX = aligned_window(WIN)

    def kernel(src_ref, rb_ref, cb_ref, act_ref, lx_ref, ly_ref, ratio_ref,
               stack_ref, mask_ref, aj_ref, bi_ref,
               ok_ref, u11_ref, u12_ref, u21_ref, u22_ref, iters_ref,
               wnd, sems):
        def dma(kb):
            return pltpu.make_async_copy(
                stack_ref.at[src_ref[0, 0, kb],
                             pl.ds(rb_ref[0, 0, kb] * 8, WINY),
                             pl.ds(cb_ref[0, 0, kb] * 128, WINX)],
                wnd.at[kb],
                sems.at[kb],
            )

        for kb in range(KB):
            @pl.when(act_ref[0, 0, kb] != 0)
            def _():
                dma(kb).start()

        # constant per-sample-index grids: p -> (j, i) in the 19x19
        # affine grid, one copy per one-hot operand shape
        def coord_grids(width):
            p_i = jax.lax.broadcasted_iota(jnp.int32, (N, width), 0)
            j_i = p_i // G
            i_i = p_i - j_i * G
            return ((j_i - half).astype(jnp.float32),
                    (i_i - half).astype(jnp.float32),
                    jax.lax.broadcasted_iota(
                        jnp.int32, (N, width), 1).astype(jnp.float32))

        j_y, i_y, iota_y = coord_grids(WINY)
        j_x, i_x, iota_x = coord_grids(WINX)
        # small (19,19) copies for the out-of-window check
        j_s = jax.lax.broadcasted_iota(
            jnp.int32, (G, G), 0).astype(jnp.float32) - half
        i_s = jax.lax.broadcasted_iota(
            jnp.int32, (G, G), 1).astype(jnp.float32) - half

        for kb in range(KB):
            @pl.when(act_ref[0, 0, kb] != 0)
            def _():
                dma(kb).wait()
                w = wnd[kb]
                lx = lx_ref[0, 0, kb]
                ly = ly_ref[0, 0, kb]
                ratio = ratio_ref[0, 0, kb]
                r8f = jnp.float32(rb_ref[0, 0, kb] * 8)
                c128f = jnp.float32(cb_ref[0, 0, kb] * 128)
                # semantic window origin (the XLA path's clip), for the
                # out-of-window observability check only
                r0o = jnp.float32(jnp.clip(
                    ly.astype(jnp.int32) - WIN // 2, 0, H - WIN))
                c0o = jnp.float32(jnp.clip(
                    lx.astype(jnp.int32) - WIN // 2, 0, W - WIN))

                def cond(state):
                    (_, _, _, _, _, alive, _, _, _, it) = state
                    return alive & (it < cfg.max_iterations)

                def body(state):
                    (u11, u12, u21, u22, ratio_bef, alive, converged,
                     conv_iter, violated, it) = state
                    a11r = u11 * ratio
                    a12r = u12 * ratio
                    a21r = u21 * ratio
                    a22r = u22 * ratio

                    wy = ly + i_y * a21r + j_y * a22r
                    wx = lx + i_x * a11r + j_x * a12r
                    y0f = jnp.floor(wy)
                    x0f = jnp.floor(wx)
                    fy = wy - y0f
                    fx = wx - x0f
                    ey = iota_y - (y0f - r8f)
                    ex = iota_x - (x0f - c128f)
                    # samples outside the image produce 0 (reference
                    # semantics helpers.cpp:229-239; the flag is ignored
                    # by findAffineShape, affine.cpp:47) — mask Ex so
                    # near-border floor indices don't alias into the
                    # window through the relative one-hot
                    # y0f varies only with the sample index p (rows), so
                    # its border test broadcasts as an (N, 1) column
                    valid = ((x0f >= 0) & (x0f < W - 1)
                             & (y0f[:, :1] >= 0) & (y0f[:, :1] < H - 1))
                    Ey = jnp.where(ey == 0, 1.0 - fy,
                                   jnp.where(ey == 1, fy, 0.0))
                    Ex = jnp.where(valid,
                                   jnp.where(ex == 0, 1.0 - fx,
                                             jnp.where(ex == 1, fx, 0.0)),
                                   0.0)
                    # bf16x3 sampling matmul: near-f32 accuracy at
                    # half the MXU passes of Mosaic's HIGHEST
                    t = dot_bf16x3(Ey, w)
                    val = jnp.sum(t * Ex, axis=1, keepdims=True)  # (N, 1)
                    img = jnp.dot(aj_ref[:], val * bi_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

                    # out-of-window observability (sample inside image
                    # but outside the SEMANTIC window — matches the XLA
                    # path; the DMA'd superset is strictly larger)
                    wxs = lx + i_s * a11r + j_s * a12r
                    wys = ly + i_s * a21r + j_s * a22r
                    xs0 = jnp.floor(wxs)
                    ys0 = jnp.floor(wys)
                    inside = ((xs0 >= 0) & (ys0 >= 0)
                              & (xs0 < W - 1) & (ys0 < H - 1))
                    ow = ((ys0 - r0o < 0) | (ys0 - r0o > WIN - 2)
                          | (xs0 - c0o < 0) | (xs0 - c0o > WIN - 2))
                    violated = violated | (alive & jnp.any(inside & ow))

                    # gradients: central diffs, one-sided at edges,
                    # NOT halved (affine.cpp:14-33)
                    gx = jnp.concatenate(
                        [img[:, 1:2] - img[:, 0:1],
                         img[:, 2:] - img[:, :-2],
                         img[:, -1:] - img[:, -2:-1]], axis=1)
                    gy = jnp.concatenate(
                        [img[1:2, :] - img[0:1, :],
                         img[2:, :] - img[:-2, :],
                         img[-1:, :] - img[-2:-1, :]], axis=0)
                    msk = mask_ref[:]
                    a = jnp.sum(gx * gx * msk) / mask_pixels
                    b = jnp.sum(gx * gy * msk) / mask_pixels
                    c = jnp.sum(gy * gy * msk) / mask_pixels

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

                    conv_iter = jnp.where(just_conv, it, conv_iter)
                    converged = converged | just_conv
                    alive = alive & ~aniso_bad & ~just_conv
                    return (n11, n12, n21, n22, ratio_act, alive,
                            converged, conv_iter, violated, it + 1)

                init = (jnp.float32(1.0), jnp.float32(0.0),
                        jnp.float32(0.0), jnp.float32(1.0),
                        jnp.float32(0.0), jnp.bool_(True),
                        jnp.bool_(False), jnp.int32(0),
                        jnp.bool_(False), jnp.int32(0))
                (u11, u12, u21, u22, _, _, converged, conv_iter,
                 violated, _) = jax.lax.while_loop(cond, body, init)
                ok_ref[0, 0, kb] = (converged & ~violated).astype(jnp.int32)
                u11_ref[0, 0, kb] = u11
                u12_ref[0, 0, kb] = u12
                u21_ref[0, 0, kb] = u21
                u22_ref[0, 0, kb] = u22
                iters_ref[0, 0, kb] = conv_iter

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
    S, Hp, Wp = stack.shape
    K = src.shape[0]
    assert K % _KB == 0
    G = cfg.smm_window_size
    aj, bi = _grid_constants(G)
    from hesaff_tpu.ops import masks
    msk = jnp.asarray(masks.smm_gauss_mask(G))
    WINY, WINX = aligned_window(win)

    kernel = _make_kernel(win, H, W, cfg, _KB)
    grid = (K // _KB,)
    # scalars ride as (G, 1, KB) blocks — trailing block dims equal the
    # array dims, the only blocked-SMEM layout Mosaic accepts
    blk = lambda: pl.BlockSpec((1, 1, _KB), lambda g: (g, 0, 0),
                               memory_space=pltpu.SMEM)
    out_blk = pl.BlockSpec((1, 1, _KB), lambda g: (g, 0, 0),
                           memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(),   # src
            blk(),   # rb
            blk(),   # cb
            blk(),   # act
            blk(),   # lx
            blk(),   # ly
            blk(),   # ratio
            pl.BlockSpec(memory_space=pltpu.HBM),    # stack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aj
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bi
        ],
        out_specs=[out_blk] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.int32),
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, 1, _KB), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_KB, WINY, WINX), jnp.float32),
            pltpu.SemaphoreType.DMA((_KB,)),
        ],
        interpret=interpret,
    )(*(a.reshape(-1, 1, _KB) for a in (src, rb, cb, act)),
      *(a.reshape(-1, 1, _KB) for a in (lx, ly, ratio)),
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
