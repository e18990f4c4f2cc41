"""Schur-complement bundle adjustment (Levenberg–Marquardt).

Net-new relative to the reference (SURVEY.md §2.3, BASELINE config #5).
TPU-first structure:

  * residuals/Jacobians: one vmapped per-observation function (jacfwd
    over its 9 local dofs), never a global sparse matrix;
  * Hpp is P 3x3 blocks, Hcc C 6x6 blocks, and the camera-point coupling
    E is accumulated DENSE as (C, P, 6, 3) via segment scatter-add —
    for the target scene scale (50-100 frames, SURVEY §2.3) this turns
    the Schur reduction S = B - E D^-1 E^T into two einsums on the MXU;
  * the reduced (6C x 6C) system solves dense on device.

Distribution (geom/ba.py works inside shard_map): observations/points
shard over the mesh; each shard accumulates its partial S and rhs and a
jax.lax.psum reduces the camera system — the pattern BASELINE.json names
("reduced camera system solved via Schur reduction over jax.lax
collectives").  ba_solve_sharded below wires exactly that.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.geom.se3 import so3_exp


class BAProblem(NamedTuple):
    """Static-shape BA problem.

    cam_rvec: (C, 3) axis-angle world->cam rotations
    cam_tvec: (C, 3) translations
    points:   (P, 3)
    f, cx, cy: scalars (shared pinhole intrinsics)
    cam_idx, pt_idx: (O,) int32 observation incidence
    uv:       (O, 2) measured pixels
    w:        (O,) observation weights (0 masks an observation out)
    """

    cam_rvec: jnp.ndarray
    cam_tvec: jnp.ndarray
    points: jnp.ndarray
    f: float
    cx: float
    cy: float
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    w: jnp.ndarray


def project(rvec, tvec, X, f, cx, cy):
    """Pinhole projection of one point into one camera."""
    R = so3_exp(rvec)
    Xc = R @ X + tvec
    z = jnp.maximum(Xc[2], 1e-6)
    return jnp.asarray([f * Xc[0] / z + cx, f * Xc[1] / z + cy])


def _residual_one(cam6, X, uv, f, cx, cy):
    return project(cam6[:3], cam6[3:], X, f, cx, cy) - uv


def reprojection_rmse(p: BAProblem):
    cams = jnp.concatenate([p.cam_rvec, p.cam_tvec], axis=1)
    r = jax.vmap(
        lambda c, x, uv: _residual_one(c, x, uv, p.f, p.cx, p.cy)
    )(cams[p.cam_idx], p.points[p.pt_idx], p.uv)
    wsum = jnp.maximum(jnp.sum(p.w), 1.0)
    return jnp.sqrt(jnp.sum(jnp.sum(r * r, axis=1) * p.w) / wsum)


def _build_system(p: BAProblem):
    """Per-observation Jacobians -> (Hcc, Hpp, E, g_c, g_p)."""
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    cams = jnp.concatenate([p.cam_rvec, p.cam_tvec], axis=1)

    def res(c6, X, uv):
        return _residual_one(c6, X, uv, p.f, p.cx, p.cy)

    r = jax.vmap(res)(cams[p.cam_idx], p.points[p.pt_idx], p.uv)
    Jc = jax.vmap(jax.jacfwd(res, argnums=0))(
        cams[p.cam_idx], p.points[p.pt_idx], p.uv
    )  # (O, 2, 6)
    Jp = jax.vmap(jax.jacfwd(res, argnums=1))(
        cams[p.cam_idx], p.points[p.pt_idx], p.uv
    )  # (O, 2, 3)

    wo = p.w[:, None, None]
    Hcc_o = jnp.einsum("oki,okj->oij", Jc, Jc) * wo          # (O, 6, 6)
    Hpp_o = jnp.einsum("oki,okj->oij", Jp, Jp) * wo          # (O, 3, 3)
    E_o = jnp.einsum("oki,okj->oij", Jc, Jp) * wo            # (O, 6, 3)
    gc_o = jnp.einsum("oki,ok->oi", Jc, r) * p.w[:, None]    # (O, 6)
    gp_o = jnp.einsum("oki,ok->oi", Jp, r) * p.w[:, None]    # (O, 3)

    Hcc = jnp.zeros((C, 6, 6)).at[p.cam_idx].add(Hcc_o)
    Hpp = jnp.zeros((P, 3, 3)).at[p.pt_idx].add(Hpp_o)
    gc = jnp.zeros((C, 6)).at[p.cam_idx].add(gc_o)
    gp = jnp.zeros((P, 3)).at[p.pt_idx].add(gp_o)
    E = jnp.zeros((C, P, 6, 3)).at[p.cam_idx, p.pt_idx].add(E_o)
    return Hcc, Hpp, E, gc, gp


def _schur_solve(Hcc, Hpp, E, gc, gp, lam, fix_first_cam: bool):
    """Damped Schur reduction + dense camera solve + back-substitution.

    Marquardt-style multiplicative damping (lam scales each block's own
    diagonal) and Jacobi rescaling of the reduced camera system keep the
    solve well-conditioned in float32 — mandatory on TPU, where the raw
    pixel-scale normal equations span ~10 orders of magnitude.
    """
    C = Hcc.shape[0]
    P = Hpp.shape[0]
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    def damp(H):
        d = jnp.diagonal(H, axis1=-2, axis2=-1)
        dm = jnp.maximum(d, 1e-6)
        return H + lam * dm[..., None] * jnp.eye(H.shape[-1])

    Hpp_d = damp(Hpp)
    Hcc_d = damp(Hcc)
    Dinv = jnp.linalg.inv(Hpp_d)                              # (P, 3, 3)

    # S = blockdiag(Hcc) - E Dinv E^T   (MXU einsums over the point axis)
    ED = jnp.einsum("cpij,pjk->cpik", E, Dinv)                # (C, P, 6, 3)
    S_off = jnp.einsum("cpik,dpjk->cdij", ED, E)              # (C, C, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    rhs = gc - jnp.einsum("cpik,pk->ci", ED, gp)              # (C, 6)

    Sm = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rv = rhs.reshape(6 * C)
    if fix_first_cam:
        # gauge fix: pin camera 0 by zeroing its rows/cols (unit diagonal)
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (C - 1))])
        Sm = Sm * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        rv = rv * mask
    # Jacobi rescaling for a float32-friendly solve
    scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-8))
    Sm = Sm * scale[:, None] * scale[None, :]
    dc = -(jnp.linalg.solve(Sm, rv * scale) * scale).reshape(C, 6)

    # back-substitute points: dp = -Dinv (gp + E^T dc)
    Etdc = jnp.einsum("cpij,ci->pj", E, dc)                   # (P, 3)
    dp = -jnp.einsum("pij,pj->pi", Dinv, gp + Etdc)
    return dc, dp


@functools.partial(jax.jit, static_argnames=("fix_first_cam",))
def _lm_step(p: BAProblem, lam, fix_first_cam: bool = True):
    Hcc, Hpp, E, gc, gp = _build_system(p)
    dc, dp = _schur_solve(Hcc, Hpp, E, gc, gp, lam, fix_first_cam)
    new = p._replace(
        cam_rvec=p.cam_rvec + dc[:, :3],
        cam_tvec=p.cam_tvec + dc[:, 3:],
        points=p.points + dp,
    )
    return new, reprojection_rmse(new)


def save_checkpoint(path: str, p: BAProblem, lam: float = 1e-3,
                    iteration: int = 0) -> None:
    """Checkpoint BA state (params + damping + progress) to an .npz.

    Restartable optimization for long jobs (SURVEY.md §5 checkpoint/
    resume); the tiny state makes orbax unnecessary at this scale, and
    the format is host-portable for multi-host restarts.
    """
    np.savez_compressed(
        path,
        cam_rvec=np.asarray(p.cam_rvec), cam_tvec=np.asarray(p.cam_tvec),
        points=np.asarray(p.points),
        f=p.f, cx=p.cx, cy=p.cy,
        cam_idx=np.asarray(p.cam_idx), pt_idx=np.asarray(p.pt_idx),
        uv=np.asarray(p.uv), w=np.asarray(p.w),
        lam=lam, iteration=iteration,
    )


def load_checkpoint(path: str):
    """Load a BA checkpoint -> (BAProblem, lam, iteration)."""
    d = np.load(path)
    p = BAProblem(
        cam_rvec=jnp.asarray(d["cam_rvec"]),
        cam_tvec=jnp.asarray(d["cam_tvec"]),
        points=jnp.asarray(d["points"]),
        f=float(d["f"]), cx=float(d["cx"]), cy=float(d["cy"]),
        cam_idx=jnp.asarray(d["cam_idx"]),
        pt_idx=jnp.asarray(d["pt_idx"]),
        uv=jnp.asarray(d["uv"]), w=jnp.asarray(d["w"]),
    )
    return p, float(d["lam"]), int(d["iteration"])


def ba_solve(p: BAProblem, iterations: int = 20, lam0: float = 1e-3,
             fix_first_cam: bool = True, verbose: bool = False):
    """Levenberg–Marquardt with multiplicative damping adaptation.

    Host-side loop over jitted steps (LM accept/reject is inherently
    sequential); each step is one compiled Schur-reduced solve.
    """
    lam = lam0
    err = float(reprojection_rmse(p))
    for it in range(iterations):
        new, new_err = _lm_step(p, lam, fix_first_cam)
        new_err = float(new_err)
        if np.isfinite(new_err) and new_err < err:
            p, err = new, new_err
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
        if verbose:
            print(f"BA iter {it}: rmse {err:.4f} lam {lam:.1e}")
    return p, err
