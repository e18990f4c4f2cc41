"""Small-scene incremental structure-from-motion (BASELINE config #5).

Pipeline: two-view seed (RANSAC F -> E -> R,t + triangulation) ->
incremental PnP registration -> periodic + final Schur-complement BA.
Track building is host-side union-find over pairwise descriptor matches
(tiny data); all numeric heavy lifting (RANSAC, triangulation, PnP
hypothesis scoring, BA) runs batched on device via the ransac/ba modules.

Scale note: this targets the 50-100 frame tier named in SURVEY.md §2.3;
the BA it calls already has the psum-reducible structure for sharding.
"""

from __future__ import annotations

from collections import defaultdict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.geom.ba import BAProblem, ba_solve, reprojection_rmse
from hesaff_tpu.geom.se3 import so3_exp, so3_log
from hesaff_tpu.match import match_descriptors
from hesaff_tpu.ransac import (
    decompose_essential,
    essential_from_fundamental,
    ransac_fundamental,
)


class Reconstruction(NamedTuple):
    cam_rvec: np.ndarray   # (C, 3) world->cam
    cam_tvec: np.ndarray   # (C, 3)
    points: np.ndarray     # (P, 3)
    track_ids: np.ndarray  # (P,) original track indices
    rmse: float
    frame_ids: np.ndarray = np.zeros(0, np.int32)  # (C,) registered frames


class UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, a):
        p = self.parent.setdefault(a, a)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[a] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(keypoints_per_frame, matches_per_pair):
    """Union-find track building.

    keypoints_per_frame: list of (N_f, 2) keypoint coordinate arrays.
    matches_per_pair: dict {(f1, f2): (idx1, idx2)}.
    Returns list of tracks, each a list of (frame, uv) with at most one
    observation per frame (conflicting tracks are dropped, the standard
    consistency filter).
    """
    uf = UnionFind()
    for (f1, f2), (i1, i2) in matches_per_pair.items():
        for a, b in zip(np.asarray(i1), np.asarray(i2)):
            uf.union((f1, int(a)), (f2, int(b)))
    groups = defaultdict(list)
    for f, kps in enumerate(keypoints_per_frame):
        for k in range(len(kps)):
            node = (f, k)
            if node in uf.parent:
                groups[uf.find(node)].append(node)
    tracks = []
    for nodes in groups.values():
        if len(nodes) < 2:
            continue
        frames = [n[0] for n in nodes]
        if len(set(frames)) != len(frames):
            continue  # inconsistent (two keypoints of one frame merged)
        tracks.append(
            sorted((f, np.asarray(keypoints_per_frame[f][k], np.float64))
                   for f, k in nodes)
        )
    return tracks


def triangulate_two_view(R, t, p1n, p2n):
    """Linear triangulation in cam1 frame from normalized image points."""
    def tri(a, b):
        A = jnp.stack([R @ jnp.append(a, 1.0), -jnp.append(b, 1.0)], axis=1)
        sol, _, _, _ = jnp.linalg.lstsq(A, -t)
        z1 = sol[0]
        return z1 * jnp.append(a, 1.0)

    return jax.vmap(tri)(jnp.asarray(p1n), jnp.asarray(p2n))


def triangulate_nview(rvecs, tvecs, uvns):
    """DLT triangulation of one point from n>=2 views.

    rvecs/tvecs: (n, 3) world->cam; uvns: (n, 2) normalized coords.
    Least-squares solution of the stacked cross-product constraints.
    """
    rvecs = jnp.asarray(rvecs, jnp.float32)
    tvecs = jnp.asarray(tvecs, jnp.float32)
    uvns = jnp.asarray(uvns, jnp.float32)
    R = so3_exp(rvecs)                      # (n, 3, 3)
    P = jnp.concatenate([R, tvecs[:, :, None]], axis=2)  # (n, 3, 4)
    x, y = uvns[:, 0], uvns[:, 1]
    r1 = x[:, None] * P[:, 2] - P[:, 0]
    r2 = y[:, None] * P[:, 2] - P[:, 1]
    A = jnp.concatenate([r1, r2], axis=0)   # (2n, 4)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Xh = vt[-1]
    return Xh[:3] / Xh[3]


def pnp_dlt(X, uvn, w=None):
    """DLT pose from >= 6 2D(normalized)-3D correspondences.

    Optional weights w (0 masks a correspondence) enable fixed-shape
    inlier refits.  Returns (rvec, tvec) with R projected onto SO(3),
    scale fixed by det(R) = 1, sign chosen to put the point mean in
    front.
    """
    X = jnp.asarray(X, jnp.float32)
    uvn = jnp.asarray(uvn, jnp.float32)
    n = X.shape[0]
    ones = jnp.ones((n, 1), jnp.float32)
    Xh = jnp.concatenate([X, ones], axis=1)  # (n, 4)
    z = jnp.zeros((n, 4), jnp.float32)
    x, y = uvn[:, 0:1], uvn[:, 1:2]
    r1 = jnp.concatenate([Xh, z, -x * Xh], axis=1)
    r2 = jnp.concatenate([z, Xh, -y * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)    # (2n, 12)
    if w is not None:
        ww = jnp.concatenate([w, w])[:, None]
        A = A * ww
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # scale + handedness
    det = jnp.linalg.det(M)
    P = P * jnp.sign(det)
    scale = jnp.abs(det) ** (1.0 / 3.0)
    M = P[:, :3] / scale
    t = P[:, 3] / scale
    u, _, vtr = jnp.linalg.svd(M)
    R = u @ vtr
    R = R * jnp.sign(jnp.linalg.det(R))
    # cheirality: flip if the point mean lands behind the camera
    zmean = jnp.mean((R @ X.T).T[:, 2] + t[2])
    flip = zmean < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    return so3_log(R), t


def pnp_ransac(X, uvn, threshold_n: float = 5e-3,
               num_hypotheses: int = 256, seed: int = 0):
    """Parallel-hypothesis PnP: 6-point DLT models scored on all points."""
    X = jnp.asarray(X, jnp.float32)
    uvn = jnp.asarray(uvn, jnp.float32)
    N = X.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), num_hypotheses)

    def reproj_err(rvec, tvec):
        R = so3_exp(rvec)
        Xc = (R @ X.T).T + tvec
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        pr = Xc[:, :2] / z[:, None]
        err = jnp.sum((pr - uvn) ** 2, axis=1)
        return jnp.where(Xc[:, 2] > 0, err, jnp.inf)

    def one(k):
        sel = jax.random.choice(k, N, (6,), replace=False)
        rv, tv = pnp_dlt(X[sel], uvn[sel])
        err = reproj_err(rv, tv)
        return jnp.sum((err < threshold_n**2).astype(jnp.int32)), rv, tv

    counts, rvs, tvs = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    rv, tv = rvs[best], tvs[best]
    inl = reproj_err(rv, tv) < threshold_n**2
    # weighted refit on inliers (fixed shape)
    rv, tv = pnp_dlt(X, uvn, inl.astype(jnp.float32))
    inl = reproj_err(rv, tv) < threshold_n**2
    return rv, tv, inl


def incremental_sfm(tracks, K, ba_every: int = 5,
                    min_track_views: int = 2, verbose: bool = False):
    """Incremental SfM over tracks: [(frame, uv), ...] lists.

    Frames must be 0..F-1 with frames 0,1 sharing enough tracks to seed.
    Returns a Reconstruction (poses world->cam, points, ATE-ready).
    """
    K = np.asarray(K, np.float64)
    Kinv = np.linalg.inv(K)
    F = 1 + max(f for tr in tracks for f, _ in tr)

    def norm_pt(uv):
        v = Kinv @ np.array([uv[0], uv[1], 1.0])
        return v[:2] / v[2]

    obs = defaultdict(dict)  # track -> frame -> uvn
    for ti, tr in enumerate(tracks):
        for f, uv in tr:
            obs[ti][f] = norm_pt(uv)

    # ---- seed from frames 0, 1
    seed_tracks = [ti for ti in obs if 0 in obs[ti] and 1 in obs[ti]]
    p1 = np.array([obs[ti][0] for ti in seed_tracks])
    p2 = np.array([obs[ti][1] for ti in seed_tracks])
    # RANSAC on normalized coords: E is F of normalized points
    res = ransac_fundamental(p1, p2, threshold=2e-5, num_hypotheses=1024)
    E = essential_from_fundamental(np.asarray(res.model), np.eye(3),
                                   np.eye(3))
    inl = np.asarray(res.inliers)
    R, t = decompose_essential(E, p1[inl], p2[inl])
    R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)

    poses = {0: (np.zeros(3), np.zeros(3))}
    rv1 = np.asarray(so3_log(jnp.asarray(R, jnp.float32)), np.float64)
    poses[1] = (rv1, t)

    X3d = {}
    pts = np.asarray(
        triangulate_two_view(jnp.asarray(R, jnp.float32),
                             jnp.asarray(t, jnp.float32),
                             p1[inl], p2[inl])
    )
    for ti, X in zip(np.asarray(seed_tracks)[inl], pts):
        if X[2] > 0.01:
            X3d[int(ti)] = X.astype(np.float64)

    def run_ba(n_iters=10):
        cam_ids = sorted(poses)
        pt_ids = sorted(X3d)
        cmap = {c: i for i, c in enumerate(cam_ids)}
        pmap = {p: i for i, p in enumerate(pt_ids)}
        ci, pi, uv = [], [], []
        for ti in pt_ids:
            for f, uvn in obs[ti].items():
                if f in poses:
                    ci.append(cmap[f])
                    pi.append(pmap[ti])
                    uv.append(uvn)
        prob = BAProblem(
            cam_rvec=jnp.asarray([poses[c][0] for c in cam_ids],
                                 jnp.float32),
            cam_tvec=jnp.asarray([poses[c][1] for c in cam_ids],
                                 jnp.float32),
            points=jnp.asarray([X3d[p] for p in pt_ids], jnp.float32),
            f=1.0, cx=0.0, cy=0.0,
            cam_idx=jnp.asarray(ci, jnp.int32),
            pt_idx=jnp.asarray(pi, jnp.int32),
            uv=jnp.asarray(np.asarray(uv), jnp.float32),
            w=jnp.ones(len(ci), jnp.float32),
        )
        sol, err = ba_solve(prob, iterations=n_iters)
        for c in cam_ids:
            poses[c] = (np.asarray(sol.cam_rvec[cmap[c]], np.float64),
                        np.asarray(sol.cam_tvec[cmap[c]], np.float64))
        for p in pt_ids:
            X3d[p] = np.asarray(sol.points[pmap[p]], np.float64)
        return err

    run_ba(8)

    # ---- register remaining frames
    for f in range(2, F):
        seen = [ti for ti in obs if f in obs[ti] and ti in X3d]
        if len(seen) < 8:
            continue
        Xs = np.array([X3d[ti] for ti in seen])
        uvs = np.array([obs[ti][f] for ti in seen])
        rv, tv, inl_f = pnp_ransac(Xs, uvs)
        poses[f] = (np.asarray(rv, np.float64), np.asarray(tv, np.float64))

        # triangulate new tracks now visible from >= 2 registered frames
        for ti in obs:
            if ti in X3d or f not in obs[ti]:
                continue
            regs = [g for g in obs[ti] if g in poses]
            if len(regs) >= min_track_views:
                rvs = np.array([poses[g][0] for g in regs])
                tvs = np.array([poses[g][1] for g in regs])
                uvns = np.array([obs[ti][g] for g in regs])
                X = np.asarray(triangulate_nview(rvs, tvs, uvns))
                # accept only points in front of all views
                Rl = np.asarray(so3_exp(jnp.asarray(rvs, jnp.float32)))
                zs = np.einsum("nij,j->ni", Rl, X)[:, 2] + tvs[:, 2]
                if np.all(zs > 0.01):
                    X3d[ti] = X.astype(np.float64)
        if (f % ba_every) == 0:
            run_ba(6)
        if verbose:
            print(f"frame {f}: {len(X3d)} points, {len(poses)} cams")

    err = run_ba(12)

    cam_ids = sorted(poses)
    pt_ids = sorted(X3d)
    return Reconstruction(
        cam_rvec=np.array([poses[c][0] for c in cam_ids]),
        cam_tvec=np.array([poses[c][1] for c in cam_ids]),
        points=np.array([X3d[p] for p in pt_ids]),
        track_ids=np.array(pt_ids),
        rmse=float(err),
        frame_ids=np.array(cam_ids, np.int32),
    )


def umeyama_align(src, dst, with_scale=True):
    """Similarity transform (s, R, t) minimizing |s R src + t - dst|."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    u, d, vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        S[2, 2] = -1
    R = u @ S @ vt
    var = (sc**2).sum() / len(src)
    s = (d * np.diag(S)).sum() / var if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def absolute_trajectory_error(est_rvec, est_tvec, gt_rvec, gt_tvec):
    """ATE RMSE after similarity (Sim3) alignment of camera centers."""
    def centers(rv, tv):
        R = np.asarray(so3_exp(jnp.asarray(rv, jnp.float32)))
        return -np.einsum("nji,nj->ni", R, tv)  # C = -R^T t

    c_est = centers(est_rvec, est_tvec)
    c_gt = centers(gt_rvec, gt_tvec)
    s, R, t = umeyama_align(c_est, c_gt)
    aligned = (s * (R @ c_est.T)).T + t
    return float(np.sqrt(((aligned - c_gt) ** 2).sum(1).mean()))
