"""Property tests for the closed-form linear algebra helpers
(SURVEY.md §4 item 3: invSqrt/rectify/solve3x3 vs numpy)."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.ops.linalg import (
    eigenvalues_2x2,
    inv_sqrt_2x2,
    rectify_up_is_up,
    solve3x3,
)


def test_solve3x3_matches_numpy():
    rng = np.random.RandomState(0)
    A = rng.randn(256, 3, 3).astype(np.float32)
    b = rng.randn(256, 3).astype(np.float32)
    x = np.asarray(solve3x3(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(
        A.astype(np.float64), b.astype(np.float64)[..., None]
    )[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_solve3x3_singular_gives_nonfinite():
    A = np.zeros((3, 3), np.float32)
    A[0, 0] = 1.0
    b = np.ones(3, np.float32)
    x = np.asarray(solve3x3(jnp.asarray(A), jnp.asarray(b)))
    assert not np.all(np.isfinite(x))


def test_inv_sqrt_2x2_properties():
    rng = np.random.RandomState(1)
    for _ in range(100):
        g = rng.randn(2, 2)
        m = g @ g.T + 0.1 * np.eye(2)  # SPD
        ia, ib, ic, l1, l2 = (
            float(v)
            for v in inv_sqrt_2x2(
                jnp.float32(m[0, 0]), jnp.float32(m[0, 1]), jnp.float32(m[1, 1])
            )
        )
        R = np.array([[ia, ib], [ib, ic]], np.float64)
        # det-normalized: det(R) == 1
        np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-4)
        # R is proportional to M^(-1/2): R M R should be ~ c*I
        P = R @ m @ R
        np.testing.assert_allclose(P[0, 1], 0.0, atol=1e-4 * abs(P[0, 0]))
        np.testing.assert_allclose(P[0, 0], P[1, 1], rtol=1e-4)
        assert l1 >= l2 > 0


def test_eigenvalues_2x2():
    rng = np.random.RandomState(2)
    M = rng.randn(64, 2, 2).astype(np.float32)
    l1, l2, ok = eigenvalues_2x2(
        jnp.asarray(M[:, 0, 0]), jnp.asarray(M[:, 0, 1]),
        jnp.asarray(M[:, 1, 0]), jnp.asarray(M[:, 1, 1]),
    )
    l1, l2, ok = map(np.asarray, (l1, l2, ok))
    for i in range(64):
        ev = np.linalg.eigvals(M[i].astype(np.float64))
        if np.iscomplexobj(ev) and np.abs(ev.imag).max() > 1e-6:
            assert not ok[i]
        else:
            ev = np.sort(ev.real)[::-1]
            assert ok[i]
            np.testing.assert_allclose([l1[i], l2[i]], ev, rtol=1e-3, atol=1e-3)


def test_rectify_up_is_up():
    rng = np.random.RandomState(3)
    g = rng.randn(128, 2, 2).astype(np.float32)
    # normalize to det 1 like the pipeline's U matrices
    det = np.abs(g[:, 0, 0] * g[:, 1, 1] - g[:, 0, 1] * g[:, 1, 0])
    g /= np.sqrt(det)[:, None, None]
    r11, r12, r21, r22 = (
        np.asarray(v)
        for v in rectify_up_is_up(
            jnp.asarray(g[:, 0, 0]), jnp.asarray(g[:, 0, 1]),
            jnp.asarray(g[:, 1, 0]), jnp.asarray(g[:, 1, 1]),
        )
    )
    # lower triangular with unit determinant
    np.testing.assert_allclose(r12, 0.0)
    np.testing.assert_allclose(r11 * r22, 1.0, rtol=1e-4)
    # A A^T invariant: rectification preserves the ellipse shape
    for i in range(128):
        A = g[i].astype(np.float64)
        Rm = np.array([[r11[i], 0.0], [r21[i], r22[i]]], np.float64)
        np.testing.assert_allclose(Rm @ Rm.T, A @ A.T, rtol=2e-3, atol=2e-4)
