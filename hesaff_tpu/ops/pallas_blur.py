"""Pallas TPU kernel: fused Gaussian blur + DoH response.

The pyramid ladder is bandwidth-bound: XLA's shift-and-add blur writes
the blurred level to HBM, then the DoH stencil reads it back.  This
kernel keeps one image resident in VMEM and produces BOTH the blurred
level and its Determinant-of-Hessian response in a single pass —
halving HBM traffic for the hot dense stage (SURVEY.md §3 hot loops
0-1).  Numerics match ops/blur + ops/hessian exactly (same shift-add
order, full f32 on the VPU).

Used when the image fits the VMEM budget (all pyramid levels do for
typical sizes); callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.ops.pallas_util import round_up as _round_up

# per-program VMEM budget: input + blurred + response + the shift-chain
# temporaries Mosaic materializes (measured: a 2MB image fails to fit;
# 1.5MB compiles) — full-resolution first octaves fall back to XLA
_VMEM_BYTES = 4 << 20


def _shift_rows(x, d):
    """Shift rows by d with edge replication (row i reads row i+d)."""
    H = x.shape[0]
    if d == 0:
        return x
    if d > 0:
        body = jax.lax.slice_in_dim(x, d, H, axis=0)
        edge = jnp.broadcast_to(x[H - 1 : H, :], (d, x.shape[1]))
        return jnp.concatenate([body, edge], axis=0)
    body = jax.lax.slice_in_dim(x, 0, H + d, axis=0)
    edge = jnp.broadcast_to(x[0:1, :], (-d, x.shape[1]))
    return jnp.concatenate([edge, body], axis=0)


def _shift_cols(x, d):
    W = x.shape[1]
    if d == 0:
        return x
    if d > 0:
        body = jax.lax.slice_in_dim(x, d, W, axis=1)
        edge = jnp.broadcast_to(x[:, W - 1 : W], (x.shape[0], d))
        return jnp.concatenate([body, edge], axis=1)
    body = jax.lax.slice_in_dim(x, 0, W + d, axis=1)
    edge = jnp.broadcast_to(x[:, 0:1], (x.shape[0], -d))
    return jnp.concatenate([edge, body], axis=1)


def _make_kernel(taps: tuple, norm2: float):
    r = len(taps) // 2

    def kernel(in_ref, blur_ref, resp_ref):
        x = in_ref[:]
        acc = None
        for i, t in enumerate(taps):
            term = t * _shift_rows(x, i - r)
            acc = term if acc is None else acc + term
        out = None
        for i, t in enumerate(taps):
            term = t * _shift_cols(acc, i - r)
            out = term if out is None else out + term
        blur_ref[:] = out

        # DoH on the freshly blurred level, still in VMEM
        lxx = (_shift_cols(out, -1) - 2.0 * out + _shift_cols(out, 1))
        lyy = (_shift_rows(out, -1) - 2.0 * out + _shift_rows(out, 1))
        d1 = _shift_rows(_shift_cols(out, 1), -1)   # (r-1, c+1)
        d2 = _shift_rows(_shift_cols(out, -1), -1)  # (r-1, c-1)
        d3 = _shift_rows(_shift_cols(out, -1), 1)   # (r+1, c-1)
        d4 = _shift_rows(_shift_cols(out, 1), 1)    # (r+1, c+1)
        lxy = (d1 - d2 + d3 - d4) * 0.25
        resp = (lxx * lyy - lxy * lxy) * norm2
        # zero the 1-px border (interior-only contract of hessian_response)
        H, W = resp.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        interior = ((rows > 0) & (rows < H - 1)
                    & (cols > 0) & (cols < W - 1))
        resp_ref[:] = jnp.where(interior, resp, 0.0)

    return kernel


def fits_vmem(height: int, width: int) -> bool:
    """Whole-level blur_doh fits the 16 MB scoped VMEM.

    Mosaic's lowering holds ~12.7 live (H, W) f32 values through the
    unrolled shift-add chains (measured: 16.57 MB scoped allocation at
    512x640 — the round-4 fleet bench OOM'd exactly there with the old
    3-array proxy).  Budget 13 live arrays against a 15.75 MB limit so
    near-threshold shapes route to the tiled kernel."""
    return 13 * height * width * 4 <= (63 << 18)


def _make_tiled_kernel(taps: tuple, norm2: float, TB: int, HALO: int,
                       H: int, W: int):
    r = len(taps) // 2

    def kernel(up_ref, mid_ref, dn_ref, blur_ref, resp_ref):
        g = pl.program_id(0)
        x = jnp.concatenate(
            [up_ref[TB - HALO:, :], mid_ref[:], dn_ref[:HALO, :]], axis=0)
        acc = None
        for i, t in enumerate(taps):
            term = t * _shift_rows(x, i - r)
            acc = term if acc is None else acc + term
        out = None
        for i, t in enumerate(taps):
            term = t * _shift_cols(acc, i - r)
            out = term if out is None else out + term
        # rows [HALO, HALO+TB) of `out` are exact: their inputs stay
        # >= r away from the block edges the shifts replicate
        blur_ref[:] = out[HALO:HALO + TB, :]

        lxx = (_shift_cols(out, -1) - 2.0 * out + _shift_cols(out, 1))
        lyy = (_shift_rows(out, -1) - 2.0 * out + _shift_rows(out, 1))
        d1 = _shift_rows(_shift_cols(out, 1), -1)
        d2 = _shift_rows(_shift_cols(out, -1), -1)
        d3 = _shift_rows(_shift_cols(out, -1), 1)
        d4 = _shift_rows(_shift_cols(out, 1), 1)
        lxy = (d1 - d2 + d3 - d4) * 0.25
        resp = ((lxx * lyy - lxy * lxy) * norm2)[HALO:HALO + TB, :]
        # zero the GLOBAL 1-px border (interior-only contract)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TB, resp.shape[1]), 0)
                + g * TB)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TB, resp.shape[1]), 1)
        interior = ((rows > 0) & (rows < H - 1)
                    & (cols > 0) & (cols < W - 1))
        resp_ref[:] = jnp.where(interior, resp, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("taps", "norm2", "interpret"))
def blur_doh_tiled(img: jnp.ndarray, taps: tuple, norm2: float,
                   interpret: bool = False):
    """Row-block tiled fused blur + DoH for images beyond the VMEM budget
    (the full-resolution first octave).  Same numerics as blur_doh.

    The halo rides as two extra blocked reads of the same padded array
    (blocks g and g+2 around the center g+1) — overlapping windows are
    inexpressible in one BlockSpec, and blocked reads keep the kernel
    vmap-friendly (no manual DMA).  ~3x input reads, but input traffic
    is a small slice of the fused pass's total.
    """
    H, W = img.shape
    r = len(taps) // 2
    HALO = _round_up(r + 1, 8)
    Wp = _round_up(W, 128)
    # block rows sized to the VMEM budget: 3 in + 2 out double-buffered
    # blocks plus the shift-chain temporaries ≈ 16 block-sized buffers
    # (measured: TB=256 at Wp=896 allocates 16.04 MB against the 16 MB
    # scoped-vmem limit — budget to 12 MB)
    TB = 256
    while TB > 2 * HALO and 16 * (TB + 2 * HALO) * Wp * 4 > 12 * (1 << 20):
        TB //= 2
    NB = -(-H // TB)
    Hp = (NB + 2) * TB

    # edge-replicate pad: one full block above (its tail rows = row 0)
    # and below; cols replicate the true right edge for the col pass
    padded = jnp.pad(img, ((TB, Hp - TB - H), (0, Wp - W)), mode="edge")

    kernel = _make_tiled_kernel(taps, norm2, TB, HALO, H, W)
    blk = lambda off: pl.BlockSpec((TB, Wp), lambda g, o=off: (g + o, 0),
                                   memory_space=pltpu.VMEM)
    blur_p, resp_p = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[blk(0), blk(1), blk(2)],
        out_specs=[
            pl.BlockSpec((TB, Wp), lambda g: (g, 0)),
            pl.BlockSpec((TB, Wp), lambda g: (g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB * TB, Wp), jnp.float32),
            jax.ShapeDtypeStruct((NB * TB, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(padded, padded, padded)
    return blur_p[:H, :W], resp_p[:H, :W]


@functools.partial(jax.jit, static_argnames=("taps", "norm2", "interpret"))
def blur_doh(img: jnp.ndarray, taps: tuple, norm2: float,
             interpret: bool = False):
    """Fused blur + DoH for one image (vmap adds the batch axis).

    img: (H, W) float32; taps: static tuple of python floats (OpenCV
    sampled-Gaussian); norm2: sigma^4 DoH normalization (the *next*
    level's sigma squared, squared).  Returns (blurred, resp).
    """
    H, W = img.shape
    kernel = _make_kernel(taps, norm2)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ],
        interpret=interpret,
    )(img)


# (A whole-octave fused ladder kernel — blur chain + 5 DoH in one tiled
# pass — lived here through round 3.  The on-chip A/B measured 38.8k
# vs 52.7k desc/s for the per-level path: the mega-kernel serialized
# levels XLA otherwise overlaps and its halo grew with the summed blur
# radii.  Deleted per the sweep record in PERF.md.)
