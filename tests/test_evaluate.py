"""Repeatability harness tests: identity + warped-pair sanity."""

import numpy as np

from hesaff_tpu import HesaffConfig, extract
from hesaff_tpu.evaluate import features_to_ellipses, repeatability

CFG = HesaffConfig()


def affine_warp_image(img, A, out_shape):
    """Sample out(x) = img(A^-1 x) with bilinear interpolation (numpy)."""
    H, W = out_shape
    Ainv = np.linalg.inv(A)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    ones = np.ones_like(xx)
    pts = np.stack([xx, yy, ones], axis=0).reshape(3, -1)
    src = Ainv @ pts
    sx = (src[0] / src[2]).reshape(H, W)
    sy = (src[1] / src[2]).reshape(H, W)
    x0 = np.clip(np.floor(sx).astype(int), 0, img.shape[1] - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, img.shape[0] - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
         + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))
    inside = (sx >= 0) & (sy >= 0) & (sx < img.shape[1] - 1) & (sy < img.shape[0] - 1)
    return np.where(inside, v, 0.0).astype(np.float32)


def test_repeatability_identity(golden_small):
    feats = extract(golden_small["gray"], CFG)
    ell = features_to_ellipses(feats, CFG.mr_size)
    r = repeatability(ell, ell, np.eye(3), golden_small["gray"].shape,
                      feats.desc, feats.desc)
    assert r.repeatability > 0.99
    assert r.matching_score > 0.9


def test_repeatability_rotated_pair(golden_mid):
    img1 = golden_mid["gray"]
    h, w = img1.shape
    ang = np.radians(10)
    c, s = np.cos(ang), np.sin(ang)
    # rotate about the image center
    T = (np.array([[1, 0, w / 2], [0, 1, h / 2], [0, 0, 1]])
         @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
         @ np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]]))
    img2 = affine_warp_image(img1, T, img1.shape)

    f1 = extract(img1, CFG)
    f2 = extract(img2, CFG)
    e1 = features_to_ellipses(f1, CFG.mr_size)
    e2 = features_to_ellipses(f2, CFG.mr_size)
    r = repeatability(e1, e2, T, img2.shape, f1.desc, f2.desc)
    # Hessian-Affine on a 10-degree rotation: expect strong repeatability
    assert r.repeatability > 0.5, r
    assert r.num_correspondences > 30
