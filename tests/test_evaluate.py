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


def test_overlap_scorer_vs_exact_reference():
    """Certify the 57x57 grid IoU scorer against the analytic-y
    integration reference (_pair_overlap_exact) on 4,000 random
    ellipse pairs spanning the whole overlap range: the <40%-error
    decision (overlap >= 0.6) that defines a VGG correspondence must
    agree wherever the true overlap is not within 0.015 of the
    threshold, and the value error must stay within 3%.
    """
    from hesaff_tpu.evaluate import _pair_overlap, _pair_overlap_exact

    rng = np.random.default_rng(0)
    n = 4000

    def rand_e(rlo=2.0, rhi=60.0):
        th = rng.uniform(0, np.pi, n)
        r1 = np.exp(rng.uniform(np.log(rlo), np.log(rhi), n))
        r2 = r1 * np.exp(rng.uniform(np.log(1 / 6), 0, n))
        c, s = np.cos(th), np.sin(th)
        R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1)
        D = np.zeros((n, 2, 2))
        D[:, 0, 0] = 1 / r1**2
        D[:, 1, 1] = 1 / r2**2
        return np.einsum("nij,njk,nlk->nil", R, D, R), r1

    E1, r1 = rand_e()
    E2, r2 = rand_e()
    ang = rng.uniform(0, 2 * np.pi, n)
    off = (rng.uniform(0, 1.2, n) * (r1 + r2))[:, None] * \
        np.stack([np.cos(ang), np.sin(ang)], -1)
    pack = lambda c, E: np.concatenate(
        [c, E[:, 0, 0, None], E[:, 0, 1, None], E[:, 1, 1, None]], 1)
    e1 = pack(np.zeros((n, 2)), E1)
    e2 = pack(off, E2)

    ov_g = _pair_overlap(e1, E1.copy(), e2, E2.copy(), True)
    ov_e = _pair_overlap_exact(e1, E1.copy(), e2, E2.copy(), True)

    assert np.abs(ov_g - ov_e).max() <= 0.03
    dg, de = ov_g >= 0.6, ov_e >= 0.6
    assert np.mean(dg == de) >= 0.999
    clear = np.abs(ov_e - 0.6) > 0.015
    np.testing.assert_array_equal(dg[clear], de[clear])
