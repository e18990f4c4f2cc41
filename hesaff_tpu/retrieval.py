"""Sharded image retrieval over descriptor databases (BASELINE config #4).

Oxford5k-style protocol: extract features for a corpus, pool all
database descriptors (with an image-id map), and answer queries by kNN
voting — each query descriptor votes for the image owning its nearest
database descriptor, optionally ratio-filtered; images rank by votes
(optionally spatially verified with RANSAC afterwards).

The database shards row-wise over hosts/devices; queries broadcast and
the vote histogram psum-reduces.  On one device the same code path uses
the blocked kNN (match.knn2), so the protocol is identical at any scale.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.match import knn2, ring_knn2


class DescriptorIndex(NamedTuple):
    desc: np.ndarray      # (M, 128) float32 (uint8 promoted)
    image_id: np.ndarray  # (M,) int32 owner image per descriptor
    n_images: int


def build_index(desc_per_image: Sequence[np.ndarray]) -> DescriptorIndex:
    """Pool per-image descriptor arrays into one flat index."""
    descs = []
    ids = []
    for i, d in enumerate(desc_per_image):
        if len(d):
            descs.append(np.asarray(d, np.float32))
            ids.append(np.full(len(d), i, np.int32))
    if not descs:
        return DescriptorIndex(np.zeros((0, 128), np.float32),
                               np.zeros(0, np.int32), len(desc_per_image))
    return DescriptorIndex(
        np.concatenate(descs), np.concatenate(ids), len(desc_per_image)
    )


def query_votes(index: DescriptorIndex, query_desc, ratio: float = 0.9):
    """Vote histogram over database images for one query image.

    Each query descriptor's nearest database neighbour votes for its
    image when it passes the Lowe ratio test against the second
    neighbour.  Returns (votes (n_images,), matches (Nq,) db row or -1).
    """
    if len(query_desc) == 0 or len(index.desc) == 0:
        return np.zeros(index.n_images, np.int32), np.full(0, -1, np.int32)
    m = knn2(jnp.asarray(np.asarray(query_desc, np.float32)),
             jnp.asarray(index.desc))
    idx = np.asarray(m.idx)
    keep = np.asarray(m.dist) < (ratio * ratio) * np.asarray(m.dist2)
    votes = np.zeros(index.n_images, np.int64)
    np.add.at(votes, index.image_id[idx[keep]], 1)
    matches = np.where(keep, idx, -1).astype(np.int32)
    return votes.astype(np.int32), matches


def rank_images(index: DescriptorIndex, query_desc, ratio: float = 0.9,
                top_k: int = 10):
    """Ranked (image_id, votes) list for a query descriptor set."""
    votes, _ = query_votes(index, query_desc, ratio)
    order = np.argsort(-votes, kind="stable")[:top_k]
    return [(int(i), int(votes[i])) for i in order if votes[i] > 0]


def sharded_query_votes(mesh, index: DescriptorIndex, query_desc,
                        ratio: float = 0.9, axis: str = "data"):
    """Multi-device retrieval: database sharded, ring kNN, psum votes.

    The database rows rotate over ICI (ring_knn2); each device merges a
    running top-2 for every query row, so the final (best, second-best)
    is exact and identical to the single-device path.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    M = len(index.desc)
    pad = (-M) % n_dev
    db = np.concatenate(
        [index.desc, np.full((pad, index.desc.shape[1]), 1e6, np.float32)]
    )
    Q = len(query_desc)
    qpad = (-Q) % n_dev
    q = np.concatenate(
        [np.asarray(query_desc, np.float32),
         np.zeros((qpad, index.desc.shape[1]), np.float32)]
    )

    ring = shard_map(
        lambda qq, dd: ring_knn2(qq, dd, axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    m = ring(jnp.asarray(q), jnp.asarray(db))
    idx = np.asarray(m.idx)[:Q]
    keep = (np.asarray(m.dist)[:Q]
            < (ratio * ratio) * np.asarray(m.dist2)[:Q])
    # padded db rows are +1e6 rows: can't win the min against real rows
    votes = np.zeros(index.n_images, np.int64)
    valid = keep & (idx < M)
    np.add.at(votes, index.image_id[idx[valid]], 1)
    return votes.astype(np.int32)
