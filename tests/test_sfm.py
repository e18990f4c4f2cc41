"""SfM tier tests: synthetic multi-view scene with ground truth -> ATE."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.geom.se3 import so3_exp
from hesaff_tpu.sfm import (
    absolute_trajectory_error,
    build_tracks,
    incremental_sfm,
    pnp_ransac,
    triangulate_nview,
)


def make_scene(F=8, P=220, noise=0.4, seed=0):
    """F cameras orbiting a point cloud; returns tracks + ground truth."""
    rng = np.random.RandomState(seed)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    X = rng.rand(P, 3) * [6, 4, 3] + [-3, -2, 7]
    rv_gt, tv_gt = [], []
    tracks_obs = [[] for _ in range(P)]
    for f in range(F):
        rv = np.array([0.0, 0.12 * f, 0.0]) + rng.randn(3) * 0.005
        C = np.array([1.1 * f - 3.5, 0.15 * f, 0.3 * np.sin(f)])
        R = np.asarray(so3_exp(jnp.asarray(rv, jnp.float32)))
        tv = -R @ C
        rv_gt.append(rv)
        tv_gt.append(tv)
        Xc = X @ R.T + tv
        uv = np.stack([
            K[0, 0] * Xc[:, 0] / Xc[:, 2] + K[0, 2],
            K[1, 1] * Xc[:, 1] / Xc[:, 2] + K[1, 2],
        ], 1) + rng.randn(P, 2) * noise
        vis = ((Xc[:, 2] > 1.0) & (uv[:, 0] > 0) & (uv[:, 0] < 640)
               & (uv[:, 1] > 0) & (uv[:, 1] < 480))
        for p in range(P):
            if vis[p]:
                tracks_obs[p].append((f, uv[p]))
    tracks = [t for t in tracks_obs if len(t) >= 2]
    return tracks, K, np.array(rv_gt), np.array(tv_gt), X


def test_pnp_ransac():
    rng = np.random.RandomState(1)
    X = rng.rand(80, 3) * 4 + [-2, -2, 5]
    rv_gt = np.array([0.1, -0.2, 0.05])
    tv_gt = np.array([0.3, -0.1, 0.4])
    R = np.asarray(so3_exp(jnp.asarray(rv_gt, jnp.float32)))
    Xc = X @ R.T + tv_gt
    uvn = Xc[:, :2] / Xc[:, 2:3] + rng.randn(80, 2) * 5e-4
    uvn[:15] = rng.rand(15, 2) - 0.5  # outliers
    rv, tv, inl = pnp_ransac(X, uvn, threshold_n=4e-3)
    assert np.asarray(inl)[15:].mean() > 0.95
    np.testing.assert_allclose(np.asarray(rv), rv_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tv), tv_gt, atol=2e-2)


def test_triangulate_nview():
    rng = np.random.RandomState(2)
    X = np.array([0.5, -0.2, 6.0])
    rvs, tvs, uvns = [], [], []
    for f in range(4):
        rv = np.array([0.0, 0.1 * f, 0.0])
        tv = np.array([-0.8 * f, 0.0, 0.0])
        R = np.asarray(so3_exp(jnp.asarray(rv, jnp.float32)))
        Xc = R @ X + tv
        rvs.append(rv)
        tvs.append(tv)
        uvns.append(Xc[:2] / Xc[2])
    Xe = np.asarray(triangulate_nview(np.array(rvs), np.array(tvs),
                                      np.array(uvns)))
    np.testing.assert_allclose(Xe, X, atol=1e-3)


def test_build_tracks():
    kps = [np.array([[0.0, 0], [1, 1], [2, 2]]),
           np.array([[10.0, 0], [11, 1]]),
           np.array([[20.0, 0], [21, 1]])]
    matches = {
        (0, 1): (np.array([0, 1]), np.array([0, 1])),
        (1, 2): (np.array([0]), np.array([0])),
    }
    tracks = build_tracks(kps, matches)
    lens = sorted(len(t) for t in tracks)
    assert lens == [2, 3]


def test_incremental_sfm_ate():
    tracks, K, rv_gt, tv_gt, X = make_scene()
    rec = incremental_sfm(tracks, K, ba_every=3)
    assert len(rec.cam_rvec) == len(rv_gt)   # every frame registered
    ate = absolute_trajectory_error(rec.cam_rvec, rec.cam_tvec,
                                    rv_gt, tv_gt)
    # camera track spans ~8 units; ATE under 2% of trajectory extent
    assert ate < 0.15, ate
    assert rec.rmse < 2e-3  # normalized-coordinate reprojection rmse


def test_cli_sfm_smoke(monkeypatch, tmp_path):
    """CLI `sfm` verb wiring: frames -> pairwise match -> tracks ->
    incremental SfM -> npz + report.  Extraction and image loading are
    stubbed with a rendered synthetic scene (geometry correctness is
    test_incremental_sfm_ate; this exercises the user-facing verb,
    BASELINE config #5)."""
    from hesaff_tpu.pipeline import Features

    rng = np.random.RandomState(3)
    F, P = 4, 150
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    X = rng.rand(P, 3) * [6, 4, 3] + [-3, -2, 7]
    base_desc = rng.randint(0, 255, (P, 128)).astype(np.uint8)
    rv_gt, tv_gt, feats = [], [], []
    for f in range(F):
        rv = np.array([0.0, 0.15 * f, 0.0])
        C = np.array([1.0 * f - 1.5, 0.1 * f, 0.2 * np.sin(f)])
        R = np.asarray(so3_exp(jnp.asarray(rv, jnp.float32)))
        tv = -R @ C
        rv_gt.append(rv)
        tv_gt.append(tv)
        Xc = X @ R.T + tv
        uv = np.stack([
            K[0, 0] * Xc[:, 0] / Xc[:, 2] + K[0, 2],
            K[1, 1] * Xc[:, 1] / Xc[:, 2] + K[1, 2],
        ], 1) + rng.randn(P, 2) * 0.3
        vis = ((Xc[:, 2] > 1.0) & (uv[:, 0] > 0) & (uv[:, 0] < 640)
               & (uv[:, 1] > 0) & (uv[:, 1] < 480))
        idx = np.nonzero(vis)[0]
        n = len(idx)
        feats.append(Features(
            x=uv[idx, 0].astype(np.float32),
            y=uv[idx, 1].astype(np.float32),
            s=np.full(n, 2.0, np.float32),
            a11=np.ones(n, np.float32), a12=np.zeros(n, np.float32),
            a21=np.zeros(n, np.float32), a22=np.ones(n, np.float32),
            response=np.ones(n, np.float32),
            type=np.zeros(n, np.int32),
            desc=base_desc[idx],
        ))

    import hesaff_tpu.pipeline as pipeline
    import hesaff_tpu.sift_io as sift_io

    it = iter(feats)
    monkeypatch.setattr(sift_io, "load_image_gray",
                        lambda p: np.zeros((480, 640), np.float32))
    monkeypatch.setattr(pipeline, "extract",
                        lambda img, cfg, **kw: next(it))

    from hesaff_tpu.cli import main
    from hesaff_tpu.sfm import absolute_trajectory_error

    out = tmp_path / "recon.npz"
    rc = main(["sfm"] + [f"frame{i}.png" for i in range(F)]
              + ["-o", str(out), "--focal", "600"])
    assert rc == 0
    d = np.load(out)
    assert d["cam_rvec"].shape == (F, 3)
    assert len(d["points"]) > 50
    ate = absolute_trajectory_error(d["cam_rvec"], d["cam_tvec"],
                                    np.array(rv_gt), np.array(tv_gt))
    assert ate < 0.2, ate
