"""Patch normalization golden tests, isolated from detection noise by
feeding the oracle's own affine shapes (affine_shapes) through
rectification + bucketed extraction."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.linalg import rectify_up_is_up
from hesaff_tpu.patches import bucket_for, extract_bucket, patch_image_size

CFG = HesaffConfig()


def run_patches(golden):
    g = golden["affine_shapes"]
    rn = golden["rect_norm"]  # affIdx, a11, a12, a21, a22, normOk
    x, y, s = g[:, 0], g[:, 1], g[:, 2]
    r11, r12, r21, r22 = (
        np.asarray(v)
        for v in rectify_up_is_up(
            jnp.asarray(g[:, 4]), jnp.asarray(g[:, 5]),
            jnp.asarray(g[:, 6]), jnp.asarray(g[:, 7]),
        )
    )
    np.testing.assert_allclose(
        np.stack([r11, r12, r21, r22], 1), rn[:, 1:5], atol=1e-4
    )

    image = jnp.asarray(golden["gray"])
    n = len(g)
    patches = np.zeros((n, CFG.patch_size, CFG.patch_size), np.float32)
    ok = np.zeros(n, bool)
    from collections import defaultdict

    groups = defaultdict(list)
    S = patch_image_size(s, CFG.mr_size)
    for i, w in enumerate(S + 2):
        groups[bucket_for(int(w))].append(i)
    for b, idx in sorted(groups.items()):
        idx = np.asarray(idx)
        pk, pok = extract_bucket(
            image, b, jnp.asarray(x[idx]), jnp.asarray(y[idx]),
            jnp.asarray(s[idx]), jnp.asarray(r11[idx]), jnp.asarray(r12[idx]),
            jnp.asarray(r21[idx]), jnp.asarray(r22[idx]), CFG,
        )
        patches[idx] = np.asarray(pk)
        ok[idx] = np.asarray(pok)
    return patches, ok


def test_patches_match_oracle(golden_small):
    rn = golden_small["rect_norm"]
    gp = golden_small["patches"]
    patches, ok = run_patches(golden_small)
    # accept/drop decisions identical
    np.testing.assert_array_equal(ok, rn[:, 5] > 0)
    # accepted patches numerically tight (values 0..255)
    acc = np.nonzero(ok)[0]
    assert len(acc) == len(gp)
    for row, i in enumerate(acc):
        np.testing.assert_allclose(
            patches[i].ravel(), gp[row], atol=0.01,
            err_msg=f"patch {row} (kp {i})",
        )
