"""Determinism + config-variant tests (SURVEY.md §5 race detection:
JAX is functional, but we still assert bit-identical re-runs, and
exercise the non-default upscale path)."""

import numpy as np

from hesaff_tpu import HesaffConfig, extract
from hesaff_tpu.geom.ba import load_checkpoint, save_checkpoint
from tests.test_geom import make_ba_problem


def test_extract_bit_deterministic(golden_small):
    f1 = extract(golden_small["gray"], HesaffConfig())
    f2 = extract(golden_small["gray"], HesaffConfig())
    np.testing.assert_array_equal(f1.x, f2.x)
    np.testing.assert_array_equal(f1.s, f2.s)
    np.testing.assert_array_equal(f1.desc, f2.desc)


def test_upscale_matches_oracle():
    """End-to-end upscale path vs the dedicated golden pack: doubleImage
    (/root/reference/helpers.cpp:297-329) + pd=0.5 first octave
    (pyramid.cpp:267-273), gated like the default-path oracle test."""
    import os

    from hesaff_tpu.sift_io import ellipse_abc
    from tests.conftest import GOLDEN_DIR, parse_sift_bytes

    d = np.load(os.path.join(GOLDEN_DIR, "synth_200x160_up.npz"))
    gu, gv, ge, gdesc = parse_sift_bytes(d["sift_file"])
    cfg = HesaffConfig(upscale_input=True)
    feats = extract(d["gray"], cfg)

    e00, e01, e11 = ellipse_abc(
        feats.a11.astype(np.float64), feats.a12.astype(np.float64),
        feats.a21.astype(np.float64), feats.a22.astype(np.float64),
        feats.s.astype(np.float64), cfg.mr_size,
    )
    matched = 0
    for i in range(len(gu)):
        dd = np.hypot(feats.x - gu[i], feats.y - gv[i])
        j = int(dd.argmin())
        if dd[j] < 0.5:
            matched += 1
            ell = np.array([e00[j], e01[j], e11[j]])
            rel = np.abs(ell - ge[i]).max() / max(np.abs(ge[i]).max(), 1e-12)
            assert rel < 0.02, f"ellipse mismatch at oracle kp {i}"
            l1 = np.abs(feats.desc[j].astype(np.int32) - gdesc[i]).mean()
            assert l1 < 0.5, f"descriptor mismatch at oracle kp {i}"
    assert matched >= 0.97 * len(gu), (matched, len(gu))
    assert abs(feats.n - len(gu)) <= max(2, 0.05 * len(gu)), (feats.n, len(gu))


def test_threshold_config():
    """Higher threshold -> strictly fewer keypoints."""
    import numpy as np

    rng = np.random.RandomState(0)
    img = (rng.rand(128, 128) * 255).astype(np.float32)
    n_lo = extract(img, HesaffConfig()).n
    n_hi = extract(img, HesaffConfig(threshold=16.0)).n
    assert n_hi <= n_lo


def test_ba_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from hesaff_tpu.geom.ba import BAProblem

    (rv, tv, X, f, cx, cy, ci, pi, uv) = make_ba_problem(C=3, P=40)
    p = BAProblem(
        cam_rvec=jnp.asarray(rv), cam_tvec=jnp.asarray(tv),
        points=jnp.asarray(X), f=f, cx=cx, cy=cy,
        cam_idx=jnp.asarray(ci), pt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv), w=jnp.ones(len(ci), jnp.float32),
    )
    path = str(tmp_path / "ba.npz")
    save_checkpoint(path, p, lam=5e-3, iteration=7)
    p2, lam, it = load_checkpoint(path)
    assert lam == 5e-3 and it == 7
    np.testing.assert_array_equal(np.asarray(p.points), np.asarray(p2.points))
    np.testing.assert_array_equal(np.asarray(p.uv), np.asarray(p2.uv))
