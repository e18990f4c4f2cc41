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

Distribution (`ba_solve_sharded`): observations are grouped into
per-point TRACKS and points shard over the mesh; each shard accumulates
its partial reduced camera system (S, rhs) and `jax.lax.psum` reduces it
— the pattern BASELINE.json names ("reduced camera system solved via
Schur reduction over jax.lax collectives").  The track layout also
replaces the dense (C, P, 6, 3) coupling E of the single-device path
with an O(observations) (P, T, 6, 3) tensor, so memory scales with the
observation count, not C*P.
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


class BATracks(NamedTuple):
    """Track-layout BA problem: observations grouped per point.

    cam_t: (P, T) int32 camera index of each observation of each point;
    uv_t:  (P, T, 2) measured pixels;  w_t: (P, T) weights (0 = padding).
    Memory is O(P*T) = O(observations) — no C*P coupling tensor.
    """

    cam_rvec: jnp.ndarray
    cam_tvec: jnp.ndarray
    points: jnp.ndarray
    f: float
    cx: float
    cy: float
    cam_t: jnp.ndarray
    uv_t: jnp.ndarray
    w_t: jnp.ndarray


def problem_to_tracks(p: BAProblem, track_cap: int | None = None,
                      pad_points_multiple: int = 1):
    """Group a flat observation list into per-point tracks (host-side).

    Returns (BATracks, n_dropped) — observations beyond track_cap per
    point are dropped and counted (never silent).  Points are padded
    with zero-weight slots to a multiple of pad_points_multiple so the
    point axis shards evenly.
    """
    cam_idx = np.asarray(p.cam_idx)
    pt_idx = np.asarray(p.pt_idx)
    uv = np.asarray(p.uv, np.float32)
    w = np.asarray(p.w, np.float32)
    P = int(p.points.shape[0])

    live = w > 0
    counts = np.bincount(pt_idx[live], minlength=P)
    T = int(max(1, counts.max())) if track_cap is None else int(track_cap)

    order = np.argsort(pt_idx[live], kind="stable")
    pts_s = pt_idx[live][order]
    # slot of each observation within its point's track (0-based)
    slot = np.arange(pts_s.size) - np.searchsorted(pts_s, pts_s)
    keep = slot < T
    n_dropped = int((~keep).sum())

    Ppad = ((P + pad_points_multiple - 1)
            // pad_points_multiple) * pad_points_multiple
    cam_t = np.zeros((Ppad, T), np.int32)
    uv_t = np.zeros((Ppad, T, 2), np.float32)
    w_t = np.zeros((Ppad, T), np.float32)
    rows = pts_s[keep]
    cols = slot[keep]
    src = np.flatnonzero(live)[order][keep]
    cam_t[rows, cols] = cam_idx[src]
    uv_t[rows, cols] = uv[src]
    w_t[rows, cols] = w[src]

    points = np.zeros((Ppad, 3), np.float32)
    points[:P] = np.asarray(p.points, np.float32)
    return BATracks(
        cam_rvec=jnp.asarray(p.cam_rvec), cam_tvec=jnp.asarray(p.cam_tvec),
        points=jnp.asarray(points), f=p.f, cx=p.cx, cy=p.cy,
        cam_t=jnp.asarray(cam_t), uv_t=jnp.asarray(uv_t),
        w_t=jnp.asarray(w_t),
    ), n_dropped


def _damp(H, lam):
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    dm = jnp.maximum(d, 1e-6)
    return H + lam * dm[..., None] * jnp.eye(H.shape[-1])


def _tracks_partials(tr: BATracks, lam):
    """Per-shard Schur partials from local points/tracks.

    Returns (Hcc_part, gc_part, Soff_part, rhs_corr_part) — psum-reducible
    over the point-sharded axis — plus the local (Dinv, E_t, gp) needed
    for back-substitution after the replicated camera solve.
    """
    C = tr.cam_rvec.shape[0]
    Pl, T = tr.w_t.shape
    cams = jnp.concatenate([tr.cam_rvec, tr.cam_tvec], axis=1)

    def res(c6, X, uv):
        return _residual_one(c6, X, uv, tr.f, tr.cx, tr.cy)

    cam_flat = tr.cam_t.reshape(-1)
    c_sel = cams[cam_flat]                                    # (Pl*T, 6)
    X_sel = jnp.repeat(tr.points, T, axis=0)                  # (Pl*T, 3)
    uv_flat = tr.uv_t.reshape(-1, 2)
    w_flat = tr.w_t.reshape(-1)

    r = jax.vmap(res)(c_sel, X_sel, uv_flat)                  # (Pl*T, 2)
    Jc = jax.vmap(jax.jacfwd(res, argnums=0))(c_sel, X_sel, uv_flat)
    Jp = jax.vmap(jax.jacfwd(res, argnums=1))(c_sel, X_sel, uv_flat)

    wo = w_flat[:, None, None]
    Hcc_o = jnp.einsum("oki,okj->oij", Jc, Jc) * wo
    gc_o = jnp.einsum("oki,ok->oi", Jc, r) * w_flat[:, None]
    Hcc = jnp.zeros((C, 6, 6)).at[cam_flat].add(Hcc_o)
    gc = jnp.zeros((C, 6)).at[cam_flat].add(gc_o)

    Hpp = jnp.einsum("oki,okj->oij", Jp, Jp).reshape(Pl, T, 3, 3)
    Hpp = jnp.sum(Hpp * tr.w_t[..., None, None], axis=1)      # (Pl, 3, 3)
    gp = jnp.einsum("oki,ok->oi", Jp, r).reshape(Pl, T, 3)
    gp = jnp.sum(gp * tr.w_t[..., None], axis=1)              # (Pl, 3)
    E_t = (jnp.einsum("oki,okj->oij", Jc, Jp)
           .reshape(Pl, T, 6, 3) * tr.w_t[..., None, None])   # (Pl, T, 6, 3)

    Dinv = jnp.linalg.inv(_damp(Hpp, lam))                    # (Pl, 3, 3)
    ED = jnp.einsum("ptik,pkl->ptil", E_t, Dinv)              # (Pl, T, 6, 3)

    # same-point camera-pair couplings -> reduced system off-diagonals
    pair = jnp.einsum("ptik,psjk->ptsij", ED, E_t)            # (Pl,T,T,6,6)
    ci = jnp.broadcast_to(tr.cam_t[:, :, None], (Pl, T, T)).reshape(-1)
    cj = jnp.broadcast_to(tr.cam_t[:, None, :], (Pl, T, T)).reshape(-1)
    Soff = (jnp.zeros((C, C, 6, 6))
            .at[ci, cj].add(pair.reshape(-1, 6, 6)))
    rhs_corr = (jnp.zeros((C, 6))
                .at[tr.cam_t.reshape(-1)]
                .add(jnp.einsum("ptik,pk->pti", ED, gp).reshape(-1, 6)))
    return (Hcc, gc, Soff, rhs_corr), (Dinv, E_t, gp)


def _reduced_solve(Hcc, gc, Soff, rhs_corr, lam, fix_first_cam: bool):
    """Damped reduced camera solve (replicated on every shard)."""
    C = Hcc.shape[0]
    S = -Soff
    S = S.at[jnp.arange(C), jnp.arange(C)].add(_damp(Hcc, lam))
    rhs = gc - rhs_corr
    Sm = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rv = rhs.reshape(6 * C)
    if fix_first_cam:
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (C - 1))])
        Sm = Sm * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        rv = rv * mask
    scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-8))
    Sm = Sm * scale[:, None] * scale[None, :]
    return -(jnp.linalg.solve(Sm, rv * scale) * scale).reshape(C, 6)


def _tracks_rmse_parts(tr: BATracks):
    cams = jnp.concatenate([tr.cam_rvec, tr.cam_tvec], axis=1)
    Pl, T = tr.w_t.shape

    def res(c6, X, uv):
        return _residual_one(c6, X, uv, tr.f, tr.cx, tr.cy)

    r = jax.vmap(res)(cams[tr.cam_t.reshape(-1)],
                      jnp.repeat(tr.points, T, axis=0),
                      tr.uv_t.reshape(-1, 2))
    w = tr.w_t.reshape(-1)
    return jnp.sum(jnp.sum(r * r, axis=1) * w), jnp.sum(w)


def _tracks_lm_step(tr: BATracks, lam, fix_first_cam: bool,
                    axis_name: str | None = None):
    """One LM step on track-layout data; psum over axis_name if sharded."""
    parts, (Dinv, E_t, gp) = _tracks_partials(tr, lam)
    if axis_name is not None:
        parts = jax.lax.psum(parts, axis_name)
    Hcc, gc, Soff, rhs_corr = parts
    dc = _reduced_solve(Hcc, gc, Soff, rhs_corr, lam, fix_first_cam)

    # back-substitute local points: dp = -Dinv (gp + sum_t E_t^T dc[cam_t])
    Etdc = jnp.einsum("ptij,pti->pj", E_t, dc[tr.cam_t])
    dp = -jnp.einsum("pij,pj->pi", Dinv, gp + Etdc)

    new = tr._replace(
        cam_rvec=tr.cam_rvec + dc[:, :3],
        cam_tvec=tr.cam_tvec + dc[:, 3:],
        points=tr.points + dp,
    )
    sq, wsum = _tracks_rmse_parts(new)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
        wsum = jax.lax.psum(wsum, axis_name)
    return new, jnp.sqrt(sq / jnp.maximum(wsum, 1.0))


def ba_solve_sharded(p: BAProblem, mesh=None, axis: str = "data",
                     iterations: int = 20, lam0: float = 1e-3,
                     fix_first_cam: bool = True,
                     track_cap: int | None = None,
                     verbose: bool = False):
    """Distributed Schur-complement BA over a device mesh.

    Points (and their observation tracks) shard over `mesh`'s `axis`;
    cameras replicate.  Each LM step accumulates per-shard partial
    reduced camera systems, `jax.lax.psum`s them over ICI, solves the
    (6C x 6C) system replicated, and back-substitutes point updates
    locally — communication is O(C^2), independent of the point count
    (SURVEY.md §5 long-context plan; BASELINE config #5).

    mesh=None runs the same track-layout step on one device (the
    O(observations) replacement for the dense-E `ba_solve`).
    Returns (BAProblem with refined params, final rmse).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    ndev = 1 if mesh is None else mesh.shape[axis]
    tracks, dropped = problem_to_tracks(
        p, track_cap=track_cap, pad_points_multiple=ndev)
    if verbose and dropped:
        print(f"BA tracks: dropped {dropped} observations over track cap")
    P = int(p.points.shape[0])
    f, cx, cy = p.f, p.cx, p.cy

    def _step_arrays(cam_rvec, cam_tvec, points, cam_t, uv_t, w_t, lam,
                     axis_name=None):
        tr = BATracks(cam_rvec=cam_rvec, cam_tvec=cam_tvec, points=points,
                      f=f, cx=cx, cy=cy, cam_t=cam_t, uv_t=uv_t, w_t=w_t)
        new, err = _tracks_lm_step(tr, lam, fix_first_cam,
                                   axis_name=axis_name)
        return (new.cam_rvec, new.cam_tvec, new.points), err

    if mesh is None:
        step = jax.jit(_step_arrays)
    else:
        pspec = PartitionSpec(axis)
        repl = PartitionSpec()
        step = jax.jit(jax.shard_map(
            functools.partial(_step_arrays, axis_name=axis),
            mesh=mesh,
            in_specs=(repl, repl, pspec, pspec, pspec, pspec, repl),
            out_specs=((repl, repl, pspec), repl),
            check_vma=False,
        ))
        sh = NamedSharding(mesh, pspec)
        tracks = tracks._replace(
            points=jax.device_put(tracks.points, sh),
            cam_t=jax.device_put(tracks.cam_t, sh),
            uv_t=jax.device_put(tracks.uv_t, sh),
            w_t=jax.device_put(tracks.w_t, sh),
        )

    sq, wsum = jax.jit(_tracks_rmse_parts)(tracks)
    err = float(jnp.sqrt(sq / jnp.maximum(wsum, 1.0)))
    lam = lam0
    for it in range(iterations):
        (rv, tv, pts), new_err = step(
            tracks.cam_rvec, tracks.cam_tvec, tracks.points,
            tracks.cam_t, tracks.uv_t, tracks.w_t, jnp.float32(lam))
        new_err = float(new_err)
        if np.isfinite(new_err) and new_err < err:
            tracks = tracks._replace(cam_rvec=rv, cam_tvec=tv, points=pts)
            err = new_err
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
        if verbose:
            print(f"BA[sharded] iter {it}: rmse {err:.4f} lam {lam:.1e}")
    out = p._replace(
        cam_rvec=tracks.cam_rvec, cam_tvec=tracks.cam_tvec,
        points=jnp.asarray(tracks.points)[:P],
    )
    return out, err


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
