"""Matching tests: exact blocked kNN, ratio/mutual filtering, ring kNN
on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hesaff_tpu.match import knn2, match_descriptors, ring_knn2


def brute_top2(q, db):
    d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    i1 = d.argmin(1)
    d1 = d[np.arange(len(q)), i1]
    d[np.arange(len(q)), i1] = np.inf
    d2 = d.min(1)
    return i1, d1, d2


def test_knn2_exact_blocked():
    rng = np.random.RandomState(0)
    q = rng.rand(200, 128).astype(np.float32) * 255
    db = rng.rand(700, 128).astype(np.float32) * 255
    m = knn2(jnp.asarray(q), jnp.asarray(db), block=256)
    i1, d1, d2 = brute_top2(q.astype(np.float64), db.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(m.idx), i1)
    np.testing.assert_allclose(np.asarray(m.dist), d1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m.dist2), d2, rtol=1e-4)


def test_match_descriptors_recovers_permutation():
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (300, 128)).astype(np.uint8)
    perm = rng.permutation(300)
    noisy = np.clip(
        base[perm].astype(np.int32) + rng.randint(-2, 3, (300, 128)), 0, 255
    ).astype(np.uint8)
    i1, i2 = match_descriptors(base, noisy, ratio=0.8)
    assert len(i1) >= 295
    np.testing.assert_array_equal(perm[i2], i1)


def test_ring_knn2_matches_dense():
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rng = np.random.RandomState(2)
    q = rng.rand(64, 128).astype(np.float32)
    db = rng.rand(128, 128).astype(np.float32)

    ring = shard_map(
        lambda qq, dd: ring_knn2(qq, dd, "data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    m = ring(jnp.asarray(q), jnp.asarray(db))
    i1, d1, d2 = brute_top2(q.astype(np.float64), db.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(m.idx), i1)
    np.testing.assert_allclose(np.asarray(m.dist), d1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dist2), d2, rtol=1e-4, atol=1e-5)
