"""SO3/SE3 exponential & logarithm maps (closed-form, batched).

Built for jax transforms.  All small-angle branches are polynomials in
theta^2 = sum(w^2) (never sqrt/arccos of a near-degenerate argument), so
forward values AND jacfwd/jacrev derivatives are finite and correct at
and around the identity — Gauss-Newton on pose residuals differentiates
exactly there.  Known limitation: so3_log derivatives blow up near
theta = pi (antipodal), as for any single-chart log.
"""

from __future__ import annotations

import jax.numpy as jnp

# branch switchover on theta^2; below this the Taylor forms are more
# accurate in f32 than the trig closed forms (1-cos cancellation)
_SMALL2 = 1e-6


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def _abc(t2):
    """a = sin(t)/t, b = (1-cos t)/t^2, c = (t-sin t)/t^3 from t2 = t^2.

    Safe: the trig branch evaluates at ts = sqrt(max(t2, _SMALL2)), whose
    gradient w.r.t. t2 is well-defined everywhere the branch is taken.
    """
    small = t2 < _SMALL2
    ts2 = jnp.where(small, 1.0, t2)
    ts = jnp.sqrt(ts2)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(ts)) / ts2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (ts - jnp.sin(ts)) / (ts2 * ts))
    return a, b, c


def so3_exp(w):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = hat(w)
    K2 = K @ K
    a, b, _ = _abc(t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    w = fac * vee(R - R^T), fac = theta / (2 sin theta).  Near the
    identity fac is a polynomial in s2 = |vee|^2/4 = sin^2(theta)
    (theta^2 = s2 + s2^2/3 + ...), keeping derivatives exact at R = I.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    s2 = jnp.sum(vee * vee, axis=-1) / 4.0  # sin^2(theta)
    small = cos > 1.0 - 1e-4                # theta < ~1.4e-2
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.arccos(cos_safe)
    sin_safe = jnp.where(small, 1.0, jnp.sqrt(jnp.maximum(1.0 - cos_safe**2,
                                                          1e-12)))
    fac = jnp.where(
        small,
        0.5 + s2 / 12.0 + s2 * s2 * (3.0 / 40.0) / 4.0,
        theta / (2.0 * sin_safe),
    )
    return fac[..., None] * vee


def se3_exp(xi):
    """Twist (..., 6) [rho, w] -> (R (...,3,3), t (...,3))."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = hat(w)
    K2 = K @ K
    _, b, c = _abc(t2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """(R, t) -> twist (..., 6) [rho, w]."""
    w = so3_log(R)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = hat(w)
    K2 = K @ K
    small = t2 < _SMALL2
    ts2 = jnp.where(small, 1.0, t2)
    ts = jnp.sqrt(ts2)
    a = jnp.sin(ts) / ts
    b = (1.0 - jnp.cos(ts)) / ts2
    # V^{-1} = I - K/2 + coef K^2, coef = (1 - a/(2b)) / theta^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - a / (2.0 * b)) / ts2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)
