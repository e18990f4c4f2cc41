"""Shared Pallas kernel helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def round_up(v: int, m: int) -> int:
    """Round v up to the next multiple of m (tile-alignment helper)."""
    return (v + m - 1) // m * m


def dot_bf16x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 matmul via three bf16 passes (the bf16x3 "HIGH" scheme).

    Mosaic only lowers DEFAULT (one bf16 pass — too coarse for sampled
    gradients, which difference nearby values) and HIGHEST (six passes)
    inside kernels; splitting each operand into bf16 hi + residual lo
    and summing ah@bh + ah@bl + al@bh reproduces XLA's HIGH at half
    HIGHEST's MXU passes.  Error ~2^-16 relative — validated round 1 on
    chip (oracle U within 0.02, desc L1 < 0.01).
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(p, q):
        return jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def dot_onehot_bf16x2(oh: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """oh @ v where oh is EXACTLY 0/1 (one-hot/permutation-like).

    0/1 entries are exact in bf16, so only v needs the hi+lo split:
    two bf16 MXU passes reproduce the f32 product to ~2^-16 relative
    (each partial product oh*vh / oh*vl is exact; only the final f32
    accumulation rounds) — vs six passes for Mosaic's HIGHEST.
    """
    ohb = oh.astype(jnp.bfloat16)
    vh = v.astype(jnp.bfloat16)
    vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(p, q):
        return jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return d(ohb, vh) + d(ohb, vl)


def dma_plumbing(stack_ref, wnd, sems, WINY, WINX, pipe: bool, KB: int,
                  next_scalars=None):
    """(start_all_current, start_all_next, wait_cur, window_of) for the
    per-block window DMAs, single- or double-buffered.

    With `pipe`, windows land in wnd[(g % 2)] and `start_all_next`
    prefetches step g+1's windows (scalars from the +1-shifted refs in
    `next_scalars`) into the other slot while step g computes.
    """
    def copy(dst_slot, sem_slot, kb, s, r, c):
        return pltpu.make_async_copy(
            stack_ref.at[s[0, 0, kb],
                         pl.ds(r[0, 0, kb] * 8, WINY),
                         pl.ds(c[0, 0, kb] * 128, WINX)],
            wnd.at[dst_slot] if dst_slot is not None else wnd.at[kb],
            sems.at[sem_slot] if sem_slot is not None else sems.at[kb],
        )

    if not pipe:
        def start_cur(src_ref, rb_ref, cb_ref, act_ref):
            for kb in range(KB):
                @pl.when(act_ref[0, 0, kb] != 0)
                def _(kb=kb):
                    copy(None, None, kb, src_ref, rb_ref, cb_ref).start()

        def start_nxt():
            pass

        def wait_cur(kb, src_ref, rb_ref, cb_ref):
            copy(None, None, kb, src_ref, rb_ref, cb_ref).wait()

        def window_of(kb):
            return wnd[kb]

        return start_cur, start_nxt, wait_cur, window_of

    g = pl.program_id(0)
    nsteps = pl.num_programs(0)
    cur = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)
    srcn_ref, rbn_ref, cbn_ref, actn_ref = next_scalars

    def start_cur(src_ref, rb_ref, cb_ref, act_ref):
        # only the first step loads its own windows; every later step's
        # windows were prefetched by its predecessor
        @pl.when(g == 0)
        def _():
            for kb in range(KB):
                @pl.when(act_ref[0, 0, kb] != 0)
                def _(kb=kb):
                    copy((cur, kb), (cur, kb), kb,
                         src_ref, rb_ref, cb_ref).start()

    def start_nxt():
        @pl.when(g + 1 < nsteps)
        def _():
            for kb in range(KB):
                @pl.when(actn_ref[0, 0, kb] != 0)
                def _(kb=kb):
                    copy((nxt, kb), (nxt, kb), kb,
                         srcn_ref, rbn_ref, cbn_ref).start()

    def wait_cur(kb, src_ref, rb_ref, cb_ref):
        copy((cur, kb), (cur, kb), kb, src_ref, rb_ref, cb_ref).wait()

    def window_of(kb):
        return wnd[cur, kb]

    return start_cur, start_nxt, wait_cur, window_of
