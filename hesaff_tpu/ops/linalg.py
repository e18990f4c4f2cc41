"""Small closed-form linear algebra, batched/vectorizable.

TPU-native equivalents of the reference's scalar helpers
(/root/reference/helpers.cpp:46-188): everything is written as
branch-free jnp expressions so it vmaps over keypoint axes and fuses
into surrounding kernels.  Semantics (pivoting order, eigenvalue
ordering, det-normalization) follow the reference exactly so that the
accept/reject decisions downstream agree.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve3x3(A, b):
    """Solve A x = b for 3x3 A with partial pivoting.

    Mirrors the elimination order of the reference solver
    (/root/reference/helpers.cpp:46-88) including its pivot-choice
    comparisons, so singular systems produce the same NaN/Inf pattern
    that localization uses as a rejection signal
    (/root/reference/pyramid.cpp:167).

    A: (..., 3, 3), b: (..., 3) -> (..., 3)
    """
    a = [[A[..., i, j] for j in range(3)] for i in range(3)]
    bb = [b[..., i] for i in range(3)]
    x0, x1, x2 = solve3x3_parts(a, bb)
    return jnp.stack([x0, x1, x2], axis=-1)


def solve3x3_parts(a, bb):
    """solve3x3 on unstacked entries: a = 3x3 nested list of arrays,
    bb = list of 3 arrays -> (x0, x1, x2).

    Shared by the dense XLA localization maps and the fused Pallas
    detect kernel (which cannot afford the (..., 3, 3) stack) — one
    arithmetic definition, bit-identical numerics on both paths.
    """

    def pick(cond, xs, ys):
        return [jnp.where(cond, x, y) for x, y in zip(xs, ys)]

    # pivot for column 0: strict > comparisons as in the reference
    p1 = jnp.abs(a[1][0]) > jnp.abs(a[0][0])
    vp = jnp.where(p1, jnp.abs(a[1][0]), jnp.abs(a[0][0]))
    p2 = jnp.abs(a[2][0]) > vp

    # pivot row 2 swaps rows 0<->2 outright; otherwise pivot row 1 swaps
    # rows 0<->1 (helpers.cpp:68 swaps the chosen pivot row with row 0)
    row0 = pick(p2, a[2], pick(p1, a[1], a[0]))
    row1 = pick(p2, a[1], pick(p1, a[0], a[1]))
    row2 = pick(p2, a[0], a[2])
    b0 = jnp.where(p2, bb[2], jnp.where(p1, bb[1], bb[0]))
    b1 = jnp.where(p2, bb[1], jnp.where(p1, bb[0], bb[1]))
    b2 = jnp.where(p2, bb[0], bb[2])

    # eliminate column 0 from rows 1, 2
    f1 = row1[0] / row0[0]
    row1 = [row1[1] - f1 * row0[1], row1[2] - f1 * row0[2]]
    b1 = b1 - f1 * b0
    f2 = row2[0] / row0[0]
    row2 = [row2[1] - f2 * row0[1], row2[2] - f2 * row0[2]]
    b2 = b2 - f2 * b0

    # pivot for column 1 (swap when |a11| < |a21|, helpers.cpp:77)
    sw = jnp.abs(row1[0]) < jnp.abs(row2[0])
    r1 = pick(sw, row2, row1)
    r2 = pick(sw, row1, row2)
    b1n = jnp.where(sw, b2, b1)
    b2n = jnp.where(sw, b1, b2)

    f3 = r2[0] / r1[0]
    r22 = r2[1] - f3 * r1[1]
    b2n = b2n - f3 * b1n

    x2 = b2n / r22
    x1 = (b1n - r1[1] * x2) / r1[0]
    x0 = (b0 - row0[2] * x2 - row0[1] * x1) / row0[0]
    return x0, x1, x2


def inv_sqrt_2x2(a, b, c):
    """Det-normalized inverse square root of symmetric [[a,b],[b,c]].

    Jacobi-rotation closed form matching /root/reference/helpers.cpp:149-175:
    returns (ia, ib, ic, l1, l2) where [[ia,ib],[ib,ic]] = M^(-1/2) scaled
    to det 1 and l1 >= l2 are its (pre-output-ordering) eigenvalues.
    """
    r_angle = jnp.where(b != 0, (c - a) / (2.0 * jnp.where(b != 0, b, 1.0)), 0.0)
    root = jnp.sqrt(1.0 + r_angle * r_angle)
    t = jnp.where(
        r_angle >= 0, 1.0 / (r_angle + root), -1.0 / (-r_angle + root)
    )
    cs = 1.0 / jnp.sqrt(1.0 + t * t)
    sn = t * cs
    cs = jnp.where(b != 0, cs, 1.0)
    sn = jnp.where(b != 0, sn, 0.0)

    x = 1.0 / jnp.sqrt(cs * cs * a - 2.0 * cs * sn * b + sn * sn * c)
    z = 1.0 / jnp.sqrt(sn * sn * a + 2.0 * cs * sn * b + cs * cs * c)
    d = jnp.sqrt(x * z)
    x = x / d
    z = z / d
    l1 = jnp.maximum(x, z)
    l2 = jnp.minimum(x, z)
    ia = cs * cs * x + sn * sn * z
    ib = -cs * sn * x + sn * cs * z
    ic = sn * sn * x + cs * cs * z
    return ia, ib, ic, l1, l2


def eigenvalues_2x2(a, b, c, d):
    """Eigenvalues of [[a,b],[c,d]]; (l1, l2, is_real) with l1 >= l2.

    Closed form per /root/reference/helpers.cpp:177-188; is_real is False
    where the discriminant is negative (values are garbage there).
    """
    trace = a + d
    delta1 = trace * trace - 4.0 * (a * d - b * c)
    is_real = delta1 >= 0
    delta = jnp.sqrt(jnp.maximum(delta1, 0.0))
    l1 = (trace + delta) / 2.0
    l2 = (trace - delta) / 2.0
    return l1, l2, is_real


def rectify_up_is_up(a11, a12, a21, a22):
    """Rotation-free (lower-triangular, det-preserving direction) frame.

    Closed form of /root/reference/helpers.cpp:90-102 ("gravity vector"
    assumption — the pipeline never assigns a SIFT orientation).
    """
    det = jnp.sqrt(jnp.abs(a11 * a22 - a12 * a21))
    b2a2 = jnp.sqrt(a12 * a12 + a11 * a11)
    r11 = b2a2 / det
    r12 = jnp.zeros_like(det)
    r21 = (a22 * a12 + a21 * a11) / (b2a2 * det)
    r22 = det / b2a2
    return r11, r12, r21, r22
