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


def test_upscale_config_runs(golden_small):
    cfg = HesaffConfig(upscale_input=True)
    feats = extract(golden_small["gray"][:80, :100], cfg)
    # end-to-end through the doubled pyramid (pixelDistance 0.5 first
    # octave); content on this crop is sparse, so just require output
    assert feats.n > 0


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
