"""Stage-golden tests: blur ladder + DoH response vs the reference oracle."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.resample import half_image
from hesaff_tpu.pyramid import build_octave, prepare_first_level

CFG = HesaffConfig()


def test_first_level_blur(golden_small):
    first, pd = prepare_first_level(jnp.asarray(golden_small["gray"]), CFG)
    assert pd == 1.0
    np.testing.assert_allclose(
        np.asarray(first), golden_small["firstLevel"], atol=2e-4
    )


def test_octave0_ladder_and_doh(golden_small):
    first, pd = prepare_first_level(jnp.asarray(golden_small["gray"]), CFG)
    o = build_octave(first, pd, CFG)
    for k in range(CFG.num_scales + 2):
        np.testing.assert_allclose(
            np.asarray(o.blurs[k]), golden_small[f"oct0_blur{k}"], atol=3e-4,
            err_msg=f"blur level {k}",
        )
        # interior only: the oracle's 1-px border is uninitialized memory
        np.testing.assert_allclose(
            np.asarray(o.resps[k])[1:-1, 1:-1],
            golden_small[f"oct0_resp{k}"][1:-1, 1:-1],
            atol=0.15,
            err_msg=f"DoH level {k}",
        )


def test_octave_chaining(golden_small):
    first, pd = prepare_first_level(jnp.asarray(golden_small["gray"]), CFG)
    o0 = build_octave(first, pd, CFG)
    o1 = build_octave(o0.next_first, pd * 2, CFG)
    np.testing.assert_allclose(
        np.asarray(o1.blurs[0]), golden_small["oct1_blur0"], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1.blurs[4]), golden_small["oct1_blur4"], atol=3e-4
    )


def test_half_image():
    x = jnp.asarray(np.arange(30.0, dtype=np.float32).reshape(5, 6))
    h = np.asarray(half_image(x))
    assert h.shape == (2, 3)
    np.testing.assert_array_equal(h, [[0, 2, 4], [12, 14, 16]])
