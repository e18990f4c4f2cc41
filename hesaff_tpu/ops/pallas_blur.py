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
    return 3 * height * width * 4 <= _VMEM_BYTES


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


def _make_chain_kernel(taps_list: tuple, norms: tuple, TB: int, HALO: int,
                       H: int, W: int):
    """Whole-octave ladder: blur_{k+1} = blur(blur_k) and DoH of every
    level, one VMEM-resident pass per row block.  HALO >= sum of blur
    radii + 1 (DoH), so rows [HALO, HALO+TB) of every level are exact."""
    nlev = len(taps_list)                 # blurs produced (levels 1..n)

    def doh(out, norm2, g):
        lxx = (_shift_cols(out, -1) - 2.0 * out + _shift_cols(out, 1))
        lyy = (_shift_rows(out, -1) - 2.0 * out + _shift_rows(out, 1))
        d1 = _shift_rows(_shift_cols(out, 1), -1)
        d2 = _shift_rows(_shift_cols(out, -1), -1)
        d3 = _shift_rows(_shift_cols(out, -1), 1)
        d4 = _shift_rows(_shift_cols(out, 1), 1)
        lxy = (d1 - d2 + d3 - d4) * 0.25
        resp = ((lxx * lyy - lxy * lxy) * norm2)[HALO:HALO + TB, :]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TB, resp.shape[1]), 0)
                + g * TB)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TB, resp.shape[1]), 1)
        interior = ((rows > 0) & (rows < H - 1)
                    & (cols > 0) & (cols < W - 1))
        return jnp.where(interior, resp, 0.0)

    def kernel(up_ref, mid_ref, dn_ref, *out_refs):
        g = pl.program_id(0)
        blur_refs = out_refs[:nlev]
        resp_refs = out_refs[nlev:]
        cur = jnp.concatenate(
            [up_ref[TB - HALO:, :], mid_ref[:], dn_ref[:HALO, :]], axis=0)
        CR, CW = cur.shape
        # global image coordinates of the concat rows/cols
        gi = (jax.lax.broadcasted_iota(jnp.int32, (CR, CW), 0)
              + g * TB - HALO)
        ci = jax.lax.broadcasted_iota(jnp.int32, (CR, CW), 1)

        def re_replicate(a):
            """Replicate the level's OWN edge row/col into the padding
            (per-level BORDER_REPLICATE, helpers.cpp:283-295 semantics —
            blur-of-replicas != replica-of-blur, and the error would
            compound level over level up to sum(radii) deep)."""
            bot = jnp.minimum(H - 1 - g * TB + HALO, CR - 1)
            sel_r = (jax.lax.broadcasted_iota(jnp.int32, (1, CR), 1)
                     == bot).astype(jnp.float32)
            erow = jnp.dot(sel_r, a, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            a = jnp.where(gi > H - 1, jnp.broadcast_to(erow, (CR, CW)), a)
            top = jnp.maximum(HALO - g * TB, 0)
            sel_t = (jax.lax.broadcasted_iota(jnp.int32, (1, CR), 1)
                     == top).astype(jnp.float32)
            trow = jnp.dot(sel_t, a, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            a = jnp.where(gi < 0, jnp.broadcast_to(trow, (CR, CW)), a)
            sel_c = (jax.lax.broadcasted_iota(jnp.int32, (CW, 1), 0)
                     == W - 1).astype(jnp.float32)
            ecol = jnp.dot(a, sel_c, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.where(ci > W - 1,
                             jnp.broadcast_to(ecol, (CR, CW)), a)

        resp_refs[0][:] = doh(cur, norms[0], g)
        for k, taps in enumerate(taps_list):
            r = len(taps) // 2
            acc = None
            for i, t in enumerate(taps):
                term = t * _shift_rows(cur, i - r)
                acc = term if acc is None else acc + term
            out = None
            for i, t in enumerate(taps):
                term = t * _shift_cols(acc, i - r)
                out = term if out is None else out + term
            cur = re_replicate(out)
            blur_refs[k][:] = cur[HALO:HALO + TB, :]
            resp_refs[k + 1][:] = doh(cur, norms[k + 1], g)

    return kernel


def _chain_tb(HALO: int, Wp: int):
    """Chain-kernel row-block size under the VMEM budget (~26 live
    block-sized values through the unrolled ladder); None = overflow."""
    TB = 256
    while TB > 2 * HALO and 26 * (TB + 2 * HALO) * Wp * 4 > 12 * (1 << 20):
        TB //= 2
    if 26 * (TB + 2 * HALO) * Wp * 4 > 12 * (1 << 20):
        return None
    return TB


def chain_fits(taps_list: tuple, width: int) -> bool:
    """True when octave_chain_tiled's smallest row block fits VMEM
    (callers fall back to the per-level blur_doh path otherwise)."""
    margin = sum(len(t) // 2 for t in taps_list) + 1
    return _chain_tb(_round_up(margin, 8), _round_up(width, 128)) is not None


@functools.partial(jax.jit, static_argnames=("taps_list", "norms",
                                             "interpret"))
def octave_chain_tiled(first: jnp.ndarray, taps_list: tuple, norms: tuple,
                       interpret: bool = False):
    """Whole-octave fused ladder: from the octave's first level, produce
    blurs 1..n and DoH responses 0..n in ONE row-block-tiled pass.

    Replaces n sequential blur_doh dispatches + the level-0 DoH: the
    intermediate levels never round-trip through HBM, and the per-call
    Mosaic fixed costs collapse to one kernel.  taps_list: static tuple
    of per-level tap tuples; norms: static per-level sigma^4 (len
    == len(taps_list) + 1).  Returns (blurs tuple, resps tuple).
    """
    H, W = first.shape
    margin = sum(len(t) // 2 for t in taps_list) + 1
    HALO = _round_up(margin, 8)
    Wp = _round_up(W, 128)
    nlev = len(taps_list)
    nout = 2 * nlev + 1
    picked = _chain_tb(HALO, Wp)
    assert picked is not None, "caller must gate on chain_fits"
    TB = picked
    NB = -(-H // TB)
    Hp = (NB + 2) * TB

    padded = jnp.pad(first, ((TB, Hp - TB - H), (0, Wp - W)), mode="edge")
    kernel = _make_chain_kernel(taps_list, norms, TB, HALO, H, W)
    blk = lambda off: pl.BlockSpec((TB, Wp), lambda g, o=off: (g + o, 0),
                                   memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[blk(0), blk(1), blk(2)],
        out_specs=[pl.BlockSpec((TB, Wp), lambda g: (g, 0))] * nout,
        out_shape=[jax.ShapeDtypeStruct((NB * TB, Wp), jnp.float32)] * nout,
        interpret=interpret,
    )(padded, padded, padded)
    outs = [o[:H, :W] for o in outs]
    return tuple(outs[:nlev]), tuple(outs[nlev:])
