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

# keypoints per grid step (window scratch = KB * WIN^2 * 4 bytes)
_KB = 8


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

    def kernel(src_ref, r0_ref, c0_ref, act_ref, lx_ref, ly_ref, ratio_ref,
               stack_ref, mask_ref, aj_ref, bi_ref,
               ok_ref, u11_ref, u12_ref, u21_ref, u22_ref, iters_ref,
               wnd, sems):
        def dma(kb):
            return pltpu.make_async_copy(
                stack_ref.at[src_ref[0, kb],
                             pl.ds(r0_ref[0, kb], WIN),
                             pl.ds(c0_ref[0, kb], WIN)],
                wnd.at[kb],
                sems.at[kb],
            )

        for kb in range(KB):
            @pl.when(act_ref[0, kb] != 0)
            def _():
                dma(kb).start()

        # constant per-sample-index grids, shaped for the one-hot build
        p_i = jax.lax.broadcasted_iota(jnp.int32, (N, WIN), 0)
        j_i = p_i // G
        i_i = p_i - j_i * G
        j_b = (j_i - half).astype(jnp.float32)
        i_b = (i_i - half).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.float32, (N, WIN), 1)
        # small (19,19) copies for the out-of-window check
        j_s = jax.lax.broadcasted_iota(jnp.float32, (G, G), 0) - half
        i_s = jax.lax.broadcasted_iota(jnp.float32, (G, G), 1) - half

        for kb in range(KB):
            @pl.when(act_ref[0, kb] != 0)
            def _():
                dma(kb).wait()
                w = wnd[kb]
                lx = lx_ref[0, kb]
                ly = ly_ref[0, kb]
                ratio = ratio_ref[0, kb]
                r0f = jnp.float32(r0_ref[0, kb])
                c0f = jnp.float32(c0_ref[0, kb])

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

                    wx = lx + i_b * a11r + j_b * a12r
                    wy = ly + i_b * a21r + j_b * a22r
                    x0f = jnp.floor(wx)
                    y0f = jnp.floor(wy)
                    fx = wx - x0f
                    fy = wy - y0f
                    ey = iota_w - (y0f - r0f)
                    ex = iota_w - (x0f - c0f)
                    # samples outside the image produce 0 (reference
                    # semantics helpers.cpp:229-239; the flag is ignored
                    # by findAffineShape, affine.cpp:47) — mask Ex so
                    # near-border floor indices don't alias into the
                    # window through the relative one-hot
                    valid = ((x0f >= 0) & (y0f >= 0)
                             & (x0f < W - 1) & (y0f < H - 1))
                    Ey = jnp.where(ey == 0, 1.0 - fy,
                                   jnp.where(ey == 1, fy, 0.0))
                    Ex = jnp.where(valid,
                                   jnp.where(ex == 0, 1.0 - fx,
                                             jnp.where(ex == 1, fx, 0.0)),
                                   0.0)
                    t = jnp.dot(Ey, w, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                    val = jnp.sum(t * Ex, axis=1, keepdims=True)  # (N, 1)
                    img = jnp.dot(aj_ref[:], val * bi_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

                    # out-of-window observability (sample inside image
                    # but outside the static window)
                    wxs = lx + i_s * a11r + j_s * a12r
                    wys = ly + i_s * a21r + j_s * a22r
                    xs0 = jnp.floor(wxs)
                    ys0 = jnp.floor(wys)
                    inside = ((xs0 >= 0) & (ys0 >= 0)
                              & (xs0 < W - 1) & (ys0 < H - 1))
                    ow = ((ys0 - r0f < 0) | (ys0 - r0f > WIN - 2)
                          | (xs0 - c0f < 0) | (xs0 - c0f > WIN - 2))
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
                ok_ref[0, kb] = (converged & ~violated).astype(jnp.int32)
                u11_ref[0, kb] = u11
                u12_ref[0, kb] = u12
                u21_ref[0, kb] = u21
                u22_ref[0, kb] = u22
                iters_ref[0, kb] = conv_iter

            @pl.when(act_ref[0, kb] == 0)
            def _():
                ok_ref[0, kb] = 0
                u11_ref[0, kb] = 0.0
                u12_ref[0, kb] = 0.0
                u21_ref[0, kb] = 0.0
                u22_ref[0, kb] = 0.0
                iters_ref[0, kb] = 0

    return kernel


@functools.partial(
    jax.jit, static_argnames=("win", "cfg", "interpret"))
def adapt_windows_pallas(stack: jnp.ndarray, src, r0, c0, act,
                         lx, ly, ratio, win: int, cfg: HesaffConfig,
                         interpret: bool = False):
    """Run the fused adaptation kernel over K keypoints.

    stack: (S, H, W) f32 blur planes (HBM-resident); src/r0/c0: (K,)
    int32 plane index + window origin (pre-clipped into the image);
    act: (K,) int32 (0 = padding slot); lx/ly/ratio: (K,) f32 keypoint
    center (octave pixels) and scale ratio.  K must be a multiple of
    the kernel block; pad with act=0 slots.
    Returns (ok_i32, u11, u12, u21, u22, iters).
    """
    S, H, W = stack.shape
    K = src.shape[0]
    assert K % _KB == 0
    G = cfg.smm_window_size
    aj, bi = _grid_constants(G)
    from hesaff_tpu.ops import masks
    msk = jnp.asarray(masks.smm_gauss_mask(G))

    kernel = _make_kernel(win, H, W, cfg, _KB)
    grid = (K // _KB,)
    blk = lambda dt: pl.BlockSpec((1, _KB), lambda g: (g, 0),
                                  memory_space=pltpu.SMEM)
    out_blk = pl.BlockSpec((1, _KB), lambda g: (g, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(jnp.int32),   # src
            blk(jnp.int32),   # r0
            blk(jnp.int32),   # c0
            blk(jnp.int32),   # act
            blk(jnp.float32),  # lx
            blk(jnp.float32),  # ly
            blk(jnp.float32),  # ratio
            pl.BlockSpec(memory_space=pltpu.ANY),    # stack (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aj
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bi
        ],
        out_specs=[out_blk] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.int32),
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.float32),
            jax.ShapeDtypeStruct((K // _KB, _KB), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_KB, win, win), jnp.float32),
            pltpu.SemaphoreType.DMA((_KB,)),
        ],
        interpret=interpret,
    )(*(a.reshape(-1, _KB) for a in (src, r0, c0, act)),
      *(a.reshape(-1, _KB) for a in (lx, ly, ratio)),
      stack, msk, jnp.asarray(aj), jnp.asarray(bi))


def adapt_flat_pallas(blur_stacks: jnp.ndarray, img_idx, src_level,
                      x, y, s, pixel_distance: float, cfg: HesaffConfig,
                      active=None, interpret: bool = False):
    """Drop-in fused-kernel variant of affine_shape.adapt_flat.

    Requires sample_window_size's unclamped window to fit the octave
    (callers fall back to the XLA path on small octaves).
    """
    from hesaff_tpu.affine_shape import AffineResult, sample_window_size

    B, L, H, W = blur_stacks.shape
    win = sample_window_size(cfg, H, W)
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
    act = active.astype(jnp.int32)
    src = jnp.where(active, src, 0)
    r0 = jnp.where(active, r0, 0)
    c0 = jnp.where(active, c0, 0)

    pad = (-K) % _KB
    if pad:
        zi = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,), a.dtype)])
        src, r0, c0, act = map(zi, (src, r0, c0, act))
        lx, ly, ratio = map(zi, (lx, ly, ratio))

    flat = blur_stacks.reshape(B * L, H, W)
    outs = adapt_windows_pallas(
        flat, src, r0, c0, act, lx, ly, ratio, win, cfg,
        interpret=interpret,
    )
    ok, u11, u12, u21, u22, iters = (o.reshape(-1) for o in outs)
    sl = slice(0, K)
    return AffineResult(
        ok=ok[sl].astype(bool), u11=u11[sl], u12=u12[sl],
        u21=u21[sl], u22=u22[sl], iters=iters[sl],
    )
