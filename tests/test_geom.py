"""Geometry tier tests: SE3 maps, Schur BA, pose graph — synthetic truth."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.geom.ba import BAProblem, ba_solve, reprojection_rmse
from hesaff_tpu.geom.posegraph import PoseGraph, pose_graph_solve
from hesaff_tpu.geom.se3 import se3_exp, se3_log, so3_exp, so3_log


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 3).astype(np.float32)
    # log returns the principal branch: keep |w| < pi for the roundtrip
    w *= (0.95 * np.pi * rng.rand(64, 1) / np.linalg.norm(w, axis=1,
                                                          keepdims=True)
          ).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, w, rtol=1e-3, atol=1e-4)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(1)
    xi = rng.randn(32, 6).astype(np.float32)
    R, t = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(R, t))
    np.testing.assert_allclose(back, xi, rtol=1e-3, atol=1e-4)


def make_ba_problem(C=6, P=150, noise=0.5, seed=0):
    rng = np.random.RandomState(seed)
    f, cx, cy = 500.0, 320.0, 240.0
    X = rng.rand(P, 3) * [6, 4, 3] + [-3, -2, 6]
    rvecs, tvecs, obs = [], [], []
    for c in range(C):
        rv = np.array([0.02, 0.3, 0.01]) * c + rng.randn(3) * 0.01
        tv = np.array([-1.2 * c + 2.5, 0.05 * c, 0.2 * c]) * 0.4
        rvecs.append(rv)
        tvecs.append(tv)
        R = np.asarray(so3_exp(jnp.asarray(rv, jnp.float32)))
        Xc = X @ R.T + tv
        uv = np.stack(
            [f * Xc[:, 0] / Xc[:, 2] + cx, f * Xc[:, 1] / Xc[:, 2] + cy], 1
        )
        for pi in range(P):
            if Xc[pi, 2] > 0.5:
                obs.append((c, pi, uv[pi] + rng.randn(2) * noise))
    cam_idx = np.asarray([o[0] for o in obs], np.int32)
    pt_idx = np.asarray([o[1] for o in obs], np.int32)
    uv = np.asarray([o[2] for o in obs], np.float32)
    return (np.asarray(rvecs, np.float32), np.asarray(tvecs, np.float32),
            X.astype(np.float32), f, cx, cy, cam_idx, pt_idx, uv)


def test_ba_converges_from_perturbed_init():
    (rv, tv, X, f, cx, cy, ci, pi, uv) = make_ba_problem(noise=0.3)
    rng = np.random.RandomState(5)
    p = BAProblem(
        cam_rvec=jnp.asarray(rv + rng.randn(*rv.shape) * 0.02),
        cam_tvec=jnp.asarray(tv + rng.randn(*tv.shape) * 0.05),
        points=jnp.asarray(X + rng.randn(*X.shape) * 0.05),
        f=f, cx=cx, cy=cy,
        cam_idx=jnp.asarray(ci), pt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv), w=jnp.ones(len(ci), jnp.float32),
    )
    err0 = float(reprojection_rmse(p))
    sol, err = ba_solve(p, iterations=15)
    assert err0 > 2.0          # perturbation really hurt
    assert err < 0.45          # recovered to the noise floor (0.3 px)


def test_ba_sharded_matches_single_device():
    """ba_solve_sharded on an 8-device mesh == the dense-E single-device
    path (same LM schedule), and the unsharded track path agrees too."""
    import jax
    from hesaff_tpu.dist import make_mesh
    from hesaff_tpu.geom.ba import ba_solve_sharded

    (rv, tv, X, f, cx, cy, ci, pi, uv) = make_ba_problem(noise=0.3, seed=3)
    rng = np.random.RandomState(7)
    p = BAProblem(
        cam_rvec=jnp.asarray(rv + rng.randn(*rv.shape) * 0.02),
        cam_tvec=jnp.asarray(tv + rng.randn(*tv.shape) * 0.05),
        points=jnp.asarray(X + rng.randn(*X.shape) * 0.05),
        f=f, cx=cx, cy=cy,
        cam_idx=jnp.asarray(ci), pt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv), w=jnp.ones(len(ci), jnp.float32),
    )
    sol_d, err_d = ba_solve(p, iterations=12)
    sol_t, err_t = ba_solve_sharded(p, mesh=None, iterations=12)
    mesh = make_mesh(len(jax.devices()))
    sol_s, err_s = ba_solve_sharded(p, mesh=mesh, iterations=12)

    assert abs(err_t - err_d) < 0.02
    assert abs(err_s - err_d) < 0.02
    # f32 reduction order differs between the psum'd shards and the
    # single-device sums, and LM accept/reject decisions can diverge on
    # borderline steps — gate on convergence (rmse above) plus loose
    # parameter agreement, not trajectory identity
    np.testing.assert_allclose(np.asarray(sol_s.cam_rvec),
                               np.asarray(sol_t.cam_rvec), atol=8e-3)
    np.testing.assert_allclose(np.asarray(sol_s.points),
                               np.asarray(sol_t.points), atol=6e-2)


def test_ba_sharded_scales_past_dense_memory():
    """50 cams / 10k points / ~40k observations — a size where the dense
    (C, P, 6, 3) E would be 144 MB; the track layout stays
    O(observations) and the sharded solve converges to the noise floor."""
    import jax
    from hesaff_tpu.dist import make_mesh
    from hesaff_tpu.geom.ba import ba_solve_sharded

    rng = np.random.RandomState(11)
    C, P = 50, 10000
    f, cx, cy = 500.0, 320.0, 240.0
    # points strung along the trajectory, each seen by 4 nearby cameras
    # (bounded track length T=4 keeps pair work O(P*T^2))
    owner = rng.randint(0, C - 3, P)
    X = np.stack([
        owner * 0.8 + rng.rand(P) * 4 - 2,
        rng.rand(P) * 4 - 2,
        rng.rand(P) * 3 + 6,
    ], 1).astype(np.float32)
    rv_gt = np.stack([[0.0, 0.004 * c, 0.0] for c in range(C)]) \
        .astype(np.float32)
    tv_gt = np.stack([[-0.8 * c, 0.0, 0.0] for c in range(C)]) \
        .astype(np.float32)
    obs_c, obs_p, obs_uv = [], [], []
    for dc in range(4):
        c = owner + dc
        R = np.asarray(so3_exp(jnp.asarray(rv_gt[c])))
        Xc = np.einsum("pij,pj->pi", R, X) + tv_gt[c]
        uv = np.stack([f * Xc[:, 0] / Xc[:, 2] + cx,
                       f * Xc[:, 1] / Xc[:, 2] + cy], 1)
        good = (Xc[:, 2] > 0.5)
        obs_c.append(c[good])
        obs_p.append(np.flatnonzero(good))
        obs_uv.append(uv[good] + rng.randn(good.sum(), 2) * 0.3)
    ci = np.concatenate(obs_c).astype(np.int32)
    pi = np.concatenate(obs_p).astype(np.int32)
    uv = np.concatenate(obs_uv).astype(np.float32)
    assert len(ci) > 30000

    p = BAProblem(
        cam_rvec=jnp.asarray(rv_gt + rng.randn(C, 3).astype(np.float32)
                             * 0.005),
        cam_tvec=jnp.asarray(tv_gt + rng.randn(C, 3).astype(np.float32)
                             * 0.02),
        points=jnp.asarray(X + rng.randn(P, 3).astype(np.float32) * 0.02),
        f=f, cx=cx, cy=cy,
        cam_idx=jnp.asarray(ci), pt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv), w=jnp.ones(len(ci), jnp.float32),
    )
    err0 = float(reprojection_rmse(p))
    mesh = make_mesh(len(jax.devices()))
    sol, err = ba_solve_sharded(p, mesh=mesh, iterations=8)
    assert err0 > 1.5
    assert err < 0.5


def test_posegraph_closes_noise():
    rng = np.random.RandomState(2)
    N = 12
    # ground-truth poses along an arc
    rv_gt = np.stack([np.array([0.0, 0.25 * i, 0.0]) for i in range(N)])
    tv_gt = np.stack([np.array([0.8 * i, 0.0, 0.1 * i]) for i in range(N)])

    def rel(i, j):
        Ri = np.asarray(so3_exp(jnp.asarray(rv_gt[i], jnp.float32)))
        Rj = np.asarray(so3_exp(jnp.asarray(rv_gt[j], jnp.float32)))
        Rij = Rj @ Ri.T
        tij = tv_gt[j] - Rij @ tv_gt[i]
        return Rij, tij

    edges, rels = [], []
    for i in range(N - 1):
        edges.append((i, i + 1))
    edges += [(0, N - 1), (0, N // 2)]  # loop closures
    rel_rv, rel_tv = [], []
    for i, j in edges:
        Rij, tij = rel(i, j)
        rel_rv.append(np.asarray(so3_log(jnp.asarray(Rij, jnp.float32))))
        rel_tv.append(tij)

    # init: noisy odometry integration
    rv0 = rv_gt + rng.randn(N, 3) * 0.03
    tv0 = tv_gt + rng.randn(N, 3) * 0.1
    rv0[0], tv0[0] = rv_gt[0], tv_gt[0]  # anchor

    g = PoseGraph(
        rvec=jnp.asarray(rv0, jnp.float32),
        tvec=jnp.asarray(tv0, jnp.float32),
        edge_i=jnp.asarray([e[0] for e in edges], np.int32),
        edge_j=jnp.asarray([e[1] for e in edges], np.int32),
        rel_rvec=jnp.asarray(np.stack(rel_rv), jnp.float32),
        rel_tvec=jnp.asarray(np.stack(rel_tv), jnp.float32),
        w=jnp.ones(len(edges), jnp.float32),
    )
    sol, err = pose_graph_solve(g, iterations=15)
    assert err < 1e-3
    np.testing.assert_allclose(np.asarray(sol.rvec), rv_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sol.tvec), tv_gt, atol=2e-2)
