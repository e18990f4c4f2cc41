"""Descriptor matching: blocked kNN on the MXU + ring-sharded variant.

Net-new relative to the reference (SURVEY.md §2.3): the reference's
output contract feeds the Oxford matching protocol but ships no matcher.
Distances use the factorized L2 form ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b
so the O(N*M*128) term is a single MXU matmul per block; top-2 per row
(for Lowe's ratio test) is a running reduction over column blocks, so
the full N x M matrix is never materialized.

The multi-device variant shards query rows over the mesh and rotates
database blocks with jax.lax.ppermute over ICI — the ring-attention
communication pattern minus softmax (SURVEY.md §5 long-context analogue).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Matches(NamedTuple):
    idx: jnp.ndarray     # (N,) int32 — best database index per query
    dist: jnp.ndarray    # (N,) float32 — best squared L2 distance
    dist2: jnp.ndarray   # (N,) float32 — second-best squared L2 distance


def _topk2_block(q, db, base):
    """Best and second-best squared-L2 for q (n,128) against db (m,128)."""
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    dn = jnp.sum(db * db, axis=1)[None, :]
    d = qn + dn - 2.0 * jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    d_masked = d.at[jnp.arange(d.shape[0]), i1].set(jnp.inf)
    d2 = jnp.min(d_masked, axis=1)
    return i1.astype(jnp.int32) + base, d1, d2


@functools.partial(jax.jit, static_argnames=("block",))
def knn2(query: jnp.ndarray, db: jnp.ndarray, block: int = 4096) -> Matches:
    """Exact 2-NN of each query descriptor in db (squared L2).

    query: (N, D) float32; db: (M, D) float32.  Column blocking keeps
    VMEM pressure bounded; the running (best, second-best) merge is
    associative across blocks.
    """
    M = db.shape[0]
    nblk = max(1, -(-M // block))
    pad = nblk * block - M
    dbp = jnp.pad(db, ((0, pad), (0, 0)), constant_values=1e6)

    def body(carry, blk):
        bi, bd1, bd2 = carry
        dbs, base = blk
        i1, d1, d2 = _topk2_block(query, dbs, base)
        # merge two (best, second) summaries
        new_best = d1 < bd1
        nd1 = jnp.where(new_best, d1, bd1)
        ni = jnp.where(new_best, i1, bi)
        nd2 = jnp.where(
            new_best,
            jnp.minimum(bd1, d2),
            jnp.minimum(bd2, d1),
        )
        return (ni, nd1, nd2), None

    blocks = dbp.reshape(nblk, block, dbp.shape[1])
    bases = (jnp.arange(nblk) * block).astype(jnp.int32)
    init = (
        jnp.zeros(query.shape[0], jnp.int32),
        jnp.full(query.shape[0], jnp.inf, jnp.float32),
        jnp.full(query.shape[0], jnp.inf, jnp.float32),
    )
    (bi, bd1, bd2), _ = jax.lax.scan(body, init, (blocks, bases))
    return Matches(idx=bi, dist=bd1, dist2=bd2)


def match_descriptors(desc1, desc2, ratio: float = 0.8,
                      cross_check: bool = True):
    """Lowe-ratio (+ optional mutual) matching of uint8 SIFT descriptors.

    Returns (idx1, idx2) numpy arrays of matched pairs.
    """
    d1 = jnp.asarray(np.asarray(desc1), jnp.float32)
    d2 = jnp.asarray(np.asarray(desc2), jnp.float32)
    if d1.shape[0] == 0 or d2.shape[0] == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    fwd = knn2(d1, d2)
    keep = np.asarray(fwd.dist) < (ratio * ratio) * np.asarray(fwd.dist2)
    i1 = np.nonzero(keep)[0]
    i2 = np.asarray(fwd.idx)[i1]
    if cross_check and len(i1):
        bwd = knn2(d2, d1)
        mutual = np.asarray(bwd.idx)[i2] == i1
        i1, i2 = i1[mutual], i2[mutual]
    return i1.astype(np.int32), i2.astype(np.int32)


def ring_knn2(query_sharded, db_sharded, axis_name: str):
    """2-NN where both query and database are sharded over `axis_name`.

    Each device owns a query block-row and a database shard; database
    shards rotate around the ring via ppermute (one ICI hop per step),
    merging the running (best, second-best) summary — communication is
    O(M/devices) per step and overlaps with the block matmul.

    For use inside shard_map(..., mesh, in_specs=P(axis), out_specs=P(axis)).
    """
    n_dev = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    shard = db_sharded.shape[0]

    def step(carry, k):
        bi, bd1, bd2, db = carry
        owner = (me - k) % n_dev
        base = (owner * shard).astype(jnp.int32)
        i1, d1, d2 = _topk2_block(query_sharded, db, base)
        new_best = d1 < bd1
        nd1 = jnp.where(new_best, d1, bd1)
        ni = jnp.where(new_best, i1, bi)
        nd2 = jnp.where(new_best, jnp.minimum(bd1, d2),
                        jnp.minimum(bd2, d1))
        db = jax.lax.ppermute(
            db, axis_name,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        return (ni, nd1, nd2, db), None

    # derive the init carries from the device-varying query shard so the
    # scan carry is typed device-varying under shard_map without the
    # (deprecated) explicit jax.lax.pvary
    zero = query_sharded[:, 0] * 0.0
    init = (
        zero.astype(jnp.int32),
        zero + jnp.inf,
        zero + jnp.inf,
        db_sharded,
    )
    (bi, bd1, bd2, _), _ = jax.lax.scan(
        step, init, jnp.arange(n_dev)
    )
    return Matches(idx=bi, dist=bd1, dist2=bd2)
