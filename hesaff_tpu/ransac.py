"""Batched-hypothesis RANSAC for two-view geometry (H and F/E).

Net-new relative to the reference (SURVEY.md §2.3).  TPU-first shape:
instead of the classic sequential hypothesize-verify loop, ALL
hypotheses are drawn and scored in parallel — minimal-set sampling is a
(num_hyp, k) gather, model estimation a batched small least-squares, and
verification one (num_hyp, N) residual matrix reduced along N.  This
turns RANSAC into three dense ops that vmap/MXU like anything else.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RansacResult(NamedTuple):
    model: jnp.ndarray     # (3, 3) best H or F
    inliers: jnp.ndarray   # (N,) bool
    num_inliers: jnp.ndarray  # () int32


def _normalize_points(pts):
    """Hartley normalization: zero-mean, mean distance sqrt(2)."""
    c = jnp.mean(pts, axis=0)
    d = jnp.mean(jnp.linalg.norm(pts - c, axis=1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    T = jnp.asarray(
        [[1.0, 0.0, -c[0]], [0.0, 1.0, -c[1]], [0.0, 0.0, 1.0]]
    ) * jnp.asarray([[s], [s], [1.0]])
    return (pts - c) * s, T


def _solve_h_4pt(p1, p2):
    """DLT homography from 4 correspondences. p1, p2: (4, 2)."""
    def rows(a, b):
        x, y = a
        u, v = b
        r1 = jnp.asarray([-x, -y, -1.0, 0.0, 0.0, 0.0, u * x, u * y, u])
        r2 = jnp.asarray([0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(p1[i], p2[i]) for i in range(4)])
    # nullspace via smallest right singular vector of the 8x9 system
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[-1]
    return h.reshape(3, 3)


def _solve_f_8pt(p1, p2):
    """Normalized 8-point fundamental matrix. p1, p2: (8, 2)."""
    n1, T1 = _normalize_points(p1)
    n2, T2 = _normalize_points(p2)
    x, y = n1[:, 0], n1[:, 1]
    u, v = n2[:, 0], n2[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    # enforce rank 2
    uf, sf, vtf = jnp.linalg.svd(F)
    F = (uf * sf.at[2].set(0.0)[None, :]) @ vtf
    return T2.T @ F @ T1


def _h_residuals(H, p1, p2):
    """Symmetric-free forward transfer error |H p1 - p2| (squared)."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    ph = jnp.concatenate([p1, ones], axis=1) @ H.T
    proj = ph[:, :2] / jnp.where(jnp.abs(ph[:, 2:3]) < 1e-12, 1e-12, ph[:, 2:3])
    return jnp.sum((proj - p2) ** 2, axis=1)


def _f_residuals(F, p1, p2):
    """Sampson distance for the epipolar constraint."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=1)
    x2 = jnp.concatenate([p2, ones], axis=1)
    Fx1 = x1 @ F.T
    Ftx2 = x2 @ F
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _normalize_masked(pts, w):
    """Hartley normalization restricted to weighted points."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sum(jnp.linalg.norm(pts - c, axis=1) * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    T = jnp.asarray(
        [[1.0, 0.0, -c[0]], [0.0, 1.0, -c[1]], [0.0, 0.0, 1.0]]
    ) * jnp.asarray([[s], [s], [1.0]])
    return (pts - c) * s, T


def _refit_h(p1, p2, w):
    """Weighted DLT homography over inliers via the 9x9 normal matrix."""
    n1, T1 = _normalize_masked(p1, w)
    n2, T2 = _normalize_masked(p2, w)
    x, y = n1[:, 0], n1[:, 1]
    u, v = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    Hn = vecs[:, 0].reshape(3, 3)
    return jnp.linalg.solve(T2, Hn @ T1)


def _refit_f(p1, p2, w):
    """Weighted 8-point fundamental over inliers (normalized, rank-2)."""
    n1, T1 = _normalize_masked(p1, w)
    n2, T2 = _normalize_masked(p2, w)
    x, y = n1[:, 0], n1[:, 1]
    u, v = n2[:, 0], n2[:, 1]
    o = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], axis=1)
    A = A * w[:, None]
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    F = vecs[:, 0].reshape(3, 3)
    uf, sf, vtf = jnp.linalg.svd(F)
    F = (uf * sf.at[2].set(0.0)[None, :]) @ vtf
    return T2.T @ F @ T1


@functools.partial(
    jax.jit, static_argnames=("model", "num_hypotheses", "min_set")
)
def _ransac(key, p1, p2, model: str, threshold: float,
            num_hypotheses: int, min_set: int):
    N = p1.shape[0]
    keys = jax.random.split(key, num_hypotheses)

    solve = _solve_h_4pt if model == "homography" else _solve_f_8pt
    resid = _h_residuals if model == "homography" else _f_residuals
    refit = _refit_h if model == "homography" else _refit_f

    def one(k):
        sel = jax.random.choice(k, N, (min_set,), replace=False)
        M = solve(p1[sel], p2[sel])
        r = resid(M, p1, p2)
        inl = r < threshold
        return jnp.sum(inl.astype(jnp.int32)), M

    counts, models = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    M = models[best]
    # local-optimization polish: two rounds of inlier least-squares refit
    for _ in range(2):
        inl = resid(M, p1, p2) < threshold
        M = refit(p1, p2, inl.astype(jnp.float32))
    inl = resid(M, p1, p2) < threshold
    return RansacResult(
        model=M, inliers=inl, num_inliers=jnp.sum(inl.astype(jnp.int32))
    )


def ransac_homography(pts1, pts2, threshold: float = 9.0,
                      num_hypotheses: int = 1024, seed: int = 0):
    """Parallel-hypothesis RANSAC homography.

    pts1, pts2: (N, 2) matched coordinates; threshold: squared px error.
    """
    key = jax.random.PRNGKey(seed)
    return _ransac(
        key, jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        "homography", threshold, num_hypotheses, 4,
    )


def ransac_fundamental(pts1, pts2, threshold: float = 3.0,
                       num_hypotheses: int = 1024, seed: int = 0):
    """Parallel-hypothesis RANSAC fundamental matrix (Sampson gating)."""
    key = jax.random.PRNGKey(seed)
    return _ransac(
        key, jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32),
        "fundamental", threshold, num_hypotheses, 8,
    )


def essential_from_fundamental(F, K1, K2):
    """E = K2^T F K1, singular values balanced to (1, 1, 0)."""
    E = jnp.asarray(K2).T @ jnp.asarray(F) @ jnp.asarray(K1)
    u, s, vt = jnp.linalg.svd(E)
    m = (s[0] + s[1]) / 2.0
    return (u * jnp.asarray([m, m, 0.0])[None, :]) @ vt


def decompose_essential(E, pts1_norm, pts2_norm):
    """Recover (R, t) from E via the cheirality check.

    pts*_norm: (N, 2) K-normalized image coordinates of inlier matches.
    Returns (R, t) with the most points in front of both cameras.
    """
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Rs = [u @ W @ vt, u @ W.T @ vt]
    ts = [u[:, 2], -u[:, 2]]

    def count_front(R, t):
        z1, z2 = _triangulate_depths(R, t, pts1_norm, pts2_norm)
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(jnp.int32))

    combos = [(R, t) for R in Rs for t in ts]
    counts = jnp.stack([count_front(R, t) for R, t in combos])
    best = jnp.argmax(counts)
    Rstack = jnp.stack([c[0] for c in combos])
    tstack = jnp.stack([c[1] for c in combos])
    return Rstack[best], tstack[best]


def _triangulate_depths(R, t, p1, p2):
    """Midpoint-free linear triangulation depths for cheirality."""
    x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
    x2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=1)

    def tri(a, b):
        # X = z1*a in cam1; in cam2: z2*b = R(z1*a) + t  =>
        # z1*(R a) - z2*b = -t, solved in least squares
        A = jnp.stack([R @ a, -b], axis=1)
        sol, _, _, _ = jnp.linalg.lstsq(A, -t)
        return sol[0], sol[1]

    z1, z2 = jax.vmap(tri)(x1, x2)
    return z1, z2
