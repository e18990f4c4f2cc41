"""End-to-end extraction driver.

Replaces the reference's callback-wired AffineHessianDetector
(/root/reference/hesaff.cpp:50-105) with a staged design:

  stage 1 (device, one jit per octave shape):
      blur ladder + DoH + NMS + localization + dedup + affine adaptation
      + up-is-up rectification -> fixed-capacity masked keypoint arrays
  stage 2 (host):  compact accepted keypoints, preserve the reference's
      (octave, level, scan) emission order, group by patch-size bucket
  stage 3 (device, one jit per (bucket, batch) shape):
      batched patch normalization -> 41x41 patches
  stage 4 (device): batched SIFT descriptors (MXU matmul binning)

The host hop between detection and description moves only O(keypoints)
scalars, not images; per-shape compilations are cached across calls.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.affine_shape import adapt_level
from hesaff_tpu.config import DEFAULT_CONFIG, HesaffConfig
from hesaff_tpu.detect import dedup_octave, detect_level
from hesaff_tpu.ops.linalg import rectify_up_is_up
from hesaff_tpu.patches import bucket_for, extract_bucket, patch_image_size
from hesaff_tpu.pyramid import build_octave, level_sigmas, prepare_first_level
from hesaff_tpu.sift import sift_descriptors


class Features(NamedTuple):
    """SoA keypoint record (reference Keypoint struct, hesaff.cpp:41-48).

    response/type are captured but not exported by the reference
    (SURVEY.md §3.5) — exposed here as first-class fields.
    """

    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    a11: np.ndarray
    a12: np.ndarray
    a21: np.ndarray
    a22: np.ndarray
    response: np.ndarray
    type: np.ndarray
    desc: np.ndarray  # (N, 128) uint8

    @property
    def n(self) -> int:
        return int(self.x.shape[0])


class ExtractStats(NamedTuple):
    """Detection funnel counters (the reference's g_numberOfPoints /
    g_numberOfAffinePoints plus capacity-overflow diagnostics)."""

    num_candidates: int
    num_keypoints: int
    num_affine: int
    num_described: int
    candidate_overflow: int
    bucket_overflow: int


@functools.partial(jax.jit, static_argnames=("pd", "cfg"))
def _octave_stage(first_level, pd: float, cfg: HesaffConfig):
    """Detection + affine adaptation + rectification for one octave."""
    H, W = first_level.shape
    sig = level_sigmas(cfg)
    o = build_octave(first_level, pd, cfg)
    cap = cfg.level_capacity(H, W)
    levels = [
        detect_level(
            o.resps[l - 1], o.resps[l], o.resps[l + 1], o.blurs[l],
            sig[l], pd, cap, cfg,
        )
        for l in (1, 2, 3)
    ]
    levels = dedup_octave(levels, H, W)
    out = []
    for lvl_i, lk in zip((1, 2, 3), levels):
        safe = lambda a, dflt: jnp.where(lk.ok, a, dflt)
        ar = adapt_level(
            o.blurs[lvl_i - 1],
            safe(lk.x, (W // 2) * pd),
            safe(lk.y, (H // 2) * pd),
            safe(lk.s, 2.0 * pd),
            pd,
            cfg,
        )
        r11, r12, r21, r22 = rectify_up_is_up(ar.u11, ar.u12, ar.u21, ar.u22)
        out.append(
            dict(
                ok=lk.ok & ar.ok,
                det_ok=lk.ok,
                x=lk.x, y=lk.y, s=lk.s,
                response=lk.response, type=lk.type,
                a11=r11, a12=r12, a21=r21, a22=r22,
                iters=ar.iters, overflow=lk.overflow,
            )
        )
    return out, o.next_first


def _pad_to(n: int, multiple: int = 64) -> int:
    m = max(multiple, 1 << (n - 1).bit_length())
    return m if n > multiple else multiple


@functools.partial(jax.jit, static_argnames=("bucket", "cfg"))
def _bucket_stage(image, bucket: int, x, y, s, a11, a12, a21, a22,
                  cfg: HesaffConfig):
    return extract_bucket(image, bucket, x, y, s, a11, a12, a21, a22, cfg)


def extract(image, cfg: HesaffConfig = DEFAULT_CONFIG,
            return_stats: bool = False):
    """Full Hessian-Affine + SIFT extraction on one grayscale image.

    image: (H, W) float32 grayscale (0..255 scale).  Returns Features
    (keypoints in the reference's octave/level/scan emission order), or
    (Features, ExtractStats) when return_stats is set.
    """
    image = jnp.asarray(image, jnp.float32)
    first, pd = prepare_first_level(image, cfg)

    recs = []
    cand_overflow = 0
    cur = first
    while (
        cur.shape[0] > cfg.min_octave_size
        and cur.shape[1] > cfg.min_octave_size
    ):
        levels, nxt = _octave_stage(cur, pd, cfg)
        for lv in levels:
            recs.append(jax.tree.map(np.asarray, lv))
        cur = nxt
        pd *= 2.0

    # host compaction, preserving emission order
    num_kp = int(sum(r["det_ok"].sum() for r in recs))
    cand_overflow = int(sum(int(r["overflow"]) for r in recs))
    ok = np.concatenate([r["ok"] for r in recs])
    fields = {
        k: np.concatenate([r[k] for r in recs])[ok]
        for k in ("x", "y", "s", "response", "type", "a11", "a12", "a21", "a22")
    }
    n_aff = int(ok.sum())

    if n_aff == 0:
        empty = Features(*([np.zeros(0, np.float32)] * 8 + [np.zeros(0, np.int32)]
                           + [np.zeros((0, 128), np.uint8)]))
        stats = ExtractStats(0, num_kp, 0, 0, cand_overflow, 0)
        return (empty, stats) if return_stats else empty

    # bucket by workspace size
    S = patch_image_size(fields["s"], cfg.mr_size)
    groups = defaultdict(list)
    bucket_overflow = 0
    for i, w in enumerate(S + 2):
        b = bucket_for(int(w))
        if b < 0:
            bucket_overflow += 1
            continue
        groups[b].append(i)

    patches = np.zeros((n_aff, cfg.patch_size, cfg.patch_size), np.float32)
    patch_ok = np.zeros(n_aff, bool)
    for b, idx in sorted(groups.items()):
        idx = np.asarray(idx)
        npad = _pad_to(len(idx))
        sel = np.zeros(npad, np.int64)
        sel[: len(idx)] = idx
        args = [jnp.asarray(fields[k][sel]) for k in
                ("x", "y", "s", "a11", "a12", "a21", "a22")]
        pk, pok = _bucket_stage(image, b, *args, cfg)
        patches[idx] = np.asarray(pk)[: len(idx)]
        patch_ok[idx] = np.asarray(pok)[: len(idx)]

    described = np.nonzero(patch_ok)[0]
    n_desc = len(described)
    if n_desc:
        npad = _pad_to(n_desc)
        pin = np.zeros((npad, cfg.patch_size, cfg.patch_size), np.float32)
        pin[:n_desc] = patches[described]
        descs = np.asarray(sift_descriptors(jnp.asarray(pin), cfg))[:n_desc]
        descs = descs.astype(np.uint8)
    else:
        descs = np.zeros((0, 128), np.uint8)

    feats = Features(
        x=fields["x"][described],
        y=fields["y"][described],
        s=fields["s"][described],
        a11=fields["a11"][described],
        a12=fields["a12"][described],
        a21=fields["a21"][described],
        a22=fields["a22"][described],
        response=fields["response"][described],
        type=fields["type"][described].astype(np.int32),
        desc=descs,
    )
    stats = ExtractStats(
        num_candidates=num_kp,
        num_keypoints=num_kp,
        num_affine=n_aff,
        num_described=n_desc,
        candidate_overflow=cand_overflow,
        bucket_overflow=bucket_overflow,
    )
    return (feats, stats) if return_stats else feats
