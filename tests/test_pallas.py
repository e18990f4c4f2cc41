"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.ops.blur import gaussian_blur_traced, gaussian_taps
from hesaff_tpu.ops.hessian import hessian_response
from hesaff_tpu.ops.pallas_blur import blur_doh, fits_vmem


def test_blur_doh_matches_xla():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(100, 128).astype(np.float32) * 200)
    taps = tuple(float(t) for t in gaussian_taps(1.2))
    sigma_next = 1.6
    blur, resp = blur_doh(img, taps, float(sigma_next**4), interpret=True)
    ref_blur = gaussian_blur_traced(img, jnp.asarray(taps))
    ref_resp = hessian_response(ref_blur, sigma_next**2)
    np.testing.assert_allclose(np.asarray(blur), np.asarray(ref_blur),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(resp), np.asarray(ref_resp),
                               atol=0.05)


def test_fits_vmem():
    assert fits_vmem(320, 400)
    assert not fits_vmem(640, 800)  # full-res first octave -> XLA path


def _smooth_stacks(rng, B, L, H, W):
    img = rng.normal(128, 40, (B, L, H, W)).astype(np.float32)
    for _ in range(8):
        for ax in (-1, -2):
            img = (np.roll(img, 1, ax) + img + np.roll(img, -1, ax)) / 3.0
    return img


def test_pallas_affine_matches_xla():
    """Fused affine-adaptation kernel (interpret) is bit-identical to the
    XLA path — including image-border zeroing, early exit, convergence
    iteration counts, and padding-slot handling."""
    from hesaff_tpu.affine_shape import adapt_flat
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.ops.pallas_affine import adapt_flat_pallas

    cfg = HesaffConfig()
    rng = np.random.default_rng(0)
    B, L, H, W = 2, 3, 200, 160
    stacks = jnp.asarray(_smooth_stacks(rng, B, L, H, W))
    K = 64
    img_idx = jnp.asarray(rng.integers(0, B, K), np.int32)
    src = jnp.asarray(rng.integers(0, L, K), np.int32)
    x = jnp.asarray(rng.uniform(20, W - 20, K), jnp.float32)
    y = jnp.asarray(rng.uniform(20, H - 20, K), jnp.float32)
    s = jnp.asarray(rng.uniform(2.0, 5.0, K), jnp.float32)
    active = jnp.asarray(rng.uniform(size=K) > 0.2)

    ref = adapt_flat(stacks, img_idx, src, x, y, s, 1.0, cfg, active=active)
    out = adapt_flat_pallas(stacks, img_idx, src, x, y, s, 1.0, cfg,
                            active=active, interpret=True)
    act = np.asarray(active)
    ro = np.asarray(ref.ok) & act
    po = np.asarray(out.ok) & act
    np.testing.assert_array_equal(ro, po)
    m = ro & po
    for f in ("u11", "u12", "u21", "u22"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, f))[m],
                                      np.asarray(getattr(out, f))[m])
    np.testing.assert_array_equal(np.asarray(ref.iters)[m],
                                  np.asarray(out.iters)[m])
