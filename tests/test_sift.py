"""SIFT descriptor golden tests: bit-exact on the oracle's own patches."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.sift import photometric_normalize, sift_descriptors
from hesaff_tpu.ops import masks

CFG = HesaffConfig()


def test_descriptors_exact_on_golden_patches(golden_small):
    gp = golden_small["patches"].reshape(-1, 41, 41)
    gd = golden_small["descriptors"]
    mine = np.asarray(sift_descriptors(jnp.asarray(gp), CFG))
    diff = np.abs(mine - gd)
    # quantized bins: all within 1, >=99.9% exact
    assert diff.max() <= 1
    assert (diff == 0).mean() >= 0.999


def test_descriptors_exact_on_golden_patches_mid(golden_mid):
    gp = golden_mid["patches"].reshape(-1, 41, 41)
    gd = golden_mid["descriptors"]
    mine = np.asarray(sift_descriptors(jnp.asarray(gp), CFG))
    diff = np.abs(mine - gd)
    assert diff.max() <= 1
    assert (diff == 0).mean() >= 0.999


def test_photometric_normalize_properties():
    rng = np.random.RandomState(0)
    patches = (rng.rand(4, 41, 41) * 200 + 10).astype(np.float32)
    support = masks.circular_gauss_mask(41) > 0
    out = np.asarray(photometric_normalize(jnp.asarray(patches),
                                           jnp.asarray(support)))
    for k in range(4):
        sel = out[k][support]
        assert abs(sel.mean() - 128.0) < 2.0  # clamping skews slightly
        assert out[k].min() >= 0 and out[k].max() <= 255


def test_photometric_normalize_flat_noop():
    flat = np.full((1, 41, 41), 55.0, np.float32)
    support = masks.circular_gauss_mask(41) > 0
    out = np.asarray(photometric_normalize(jnp.asarray(flat),
                                           jnp.asarray(support)))
    np.testing.assert_array_equal(out, flat)  # sigma < 1e-4 -> unchanged
