"""RANSAC tests on synthetic two-view geometry with known ground truth."""

import numpy as np

from hesaff_tpu.ransac import (
    decompose_essential,
    essential_from_fundamental,
    ransac_fundamental,
    ransac_homography,
)


def make_homography_data(n=200, outlier_frac=0.3, seed=0):
    rng = np.random.RandomState(seed)
    H = np.array([[1.1, 0.1, 5.0], [-0.05, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
    p1 = rng.rand(n, 2) * 500
    ph = np.concatenate([p1, np.ones((n, 1))], axis=1) @ H.T
    p2 = ph[:, :2] / ph[:, 2:3]
    p2 += rng.randn(n, 2) * 0.3
    n_out = int(n * outlier_frac)
    p2[:n_out] = rng.rand(n_out, 2) * 500
    return p1, p2, H, n_out


def test_ransac_homography():
    p1, p2, H, n_out = make_homography_data()
    res = ransac_homography(p1, p2, threshold=9.0, num_hypotheses=512)
    inl = np.asarray(res.inliers)
    # all true inliers found, (almost) no outliers admitted
    assert inl[n_out:].mean() > 0.97
    assert inl[:n_out].mean() < 0.05
    Hm = np.array(res.model)
    Hm /= Hm[2, 2]
    np.testing.assert_allclose(Hm, H / H[2, 2], rtol=0.05, atol=0.05)


def make_two_view_data(n=300, outlier_frac=0.2, seed=1):
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # camera 2 pose (cam1 = identity)
    angle = 0.15
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.5, 0.05, 0.1])
    X = rng.rand(n, 3) * [4, 3, 4] + [-2, -1.5, 4]
    x1 = (X / X[:, 2:3]) @ K.T
    X2 = X @ R.T + t
    x2 = (X2 / X2[:, 2:3]) @ K.T
    p1 = x1[:, :2] + rng.randn(n, 2) * 0.3
    p2 = x2[:, :2] + rng.randn(n, 2) * 0.3
    n_out = int(n * outlier_frac)
    p2[:n_out] = rng.rand(n_out, 2) * [640, 480]
    return p1, p2, K, R, t, n_out


def test_ransac_fundamental_and_pose():
    p1, p2, K, R, t, n_out = make_two_view_data()
    res = ransac_fundamental(p1, p2, threshold=3.0, num_hypotheses=1024)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.1

    E = np.asarray(essential_from_fundamental(np.asarray(res.model), K, K))
    Kinv = np.linalg.inv(K)
    sel = np.nonzero(inl)[0]
    h1 = np.concatenate([p1[sel], np.ones((len(sel), 1))], 1) @ Kinv.T
    h2 = np.concatenate([p2[sel], np.ones((len(sel), 1))], 1) @ Kinv.T
    Rm, tm = decompose_essential(E, h1[:, :2], h2[:, :2])
    Rm, tm = np.asarray(Rm), np.asarray(tm)
    # rotation within ~1 degree
    ang = np.degrees(np.arccos(np.clip((np.trace(Rm.T @ R) - 1) / 2, -1, 1)))
    assert ang < 1.0
    # translation direction within ~11 degrees (narrow baseline + noise)
    cos = abs(tm @ t / (np.linalg.norm(tm) * np.linalg.norm(t)))
    assert cos > 0.98
