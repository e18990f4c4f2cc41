"""Chunked vmap with runtime skip of all-padding chunks.

Fixed-capacity masked buffers are the price of static shapes on TPU;
this utility claws the padding cost back: the mapped body runs per
chunk under lax.map (bounding peak memory) and, given a validity mask,
all-padding chunks short-circuit through lax.cond at runtime.  Since
compaction packs real elements into the leading slots, capacity slack
beyond the real count costs almost nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_indices(mask: jnp.ndarray, capacity: int):
    """Indices of set elements in order, padded to `capacity`.

    cumsum + searchsorted (the j-th hit is the first index whose running
    count reaches j+1): bandwidth-bound stream compaction.  jnp.nonzero
    lowers to a full sort on TPU (~5 ms per 512k elements, measured) and
    dominated detection before this.  Returns (idx, valid, overflow).
    """
    flat = mask.reshape(-1)
    csum = jnp.cumsum(flat.astype(jnp.int32))
    n = csum[-1]
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(csum, targets).astype(jnp.int32)
    idx = jnp.minimum(idx, flat.shape[0] - 1)
    valid = targets <= n
    idx = jnp.where(valid, idx, 0)
    return idx, valid, jnp.maximum(n - capacity, 0)


def chunked_vmap(fn, args, chunk: int, active=None):
    """vmap fn over the leading axis in sequential chunks.

    fn: positional function of per-element args; args: tuple of arrays
    sharing the leading axis; chunk: static chunk size; active: (N,)
    bool marking real elements (None = all real, no skipping).
    """
    n = args[0].shape[0]
    pad = (-n) % chunk
    nchunks = (n + pad) // chunk

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
            )
        return a.reshape(nchunks, chunk, *a.shape[1:])

    stacked = tuple(prep(a) for a in args)

    if active is None:
        out = jax.lax.map(lambda xs: jax.vmap(fn)(*xs), stacked)
    else:
        act = prep(active)
        probe = jax.eval_shape(lambda xs: jax.vmap(fn)(*xs),
                               jax.tree.map(lambda a: a[0], stacked))

        def body(xs_act):
            xs, a = xs_act
            return jax.lax.cond(
                jnp.any(a),
                lambda: jax.vmap(fn)(*xs),
                lambda: jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), probe
                ),
            )

        out = jax.lax.map(body, (stacked, act))
    return jax.tree.map(
        lambda o: o.reshape(-1, *o.shape[2:])[:n], out
    )
