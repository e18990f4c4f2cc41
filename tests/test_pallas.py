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
