"""Batched multi-image extraction — the TPU throughput path.

Phase A (one jit, vmapped over the image batch): pyramid + detection +
affine adaptation + rectification for every octave, producing dense
fixed-capacity keypoint arrays per image.

Phase B (host): read back only the small keypoint arrays, group accepted
keypoints from the WHOLE batch by patch-size bucket (cross-image
bucketing amortizes the bucket paddings), run one batched patch kernel
per bucket and one batched SIFT kernel over all patches.

The only host<->device synchronization is O(keypoints) scalars between
the phases; images stay resident on device.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu.affine_shape import adapt_compacted
from hesaff_tpu.config import DEFAULT_CONFIG, HesaffConfig
from hesaff_tpu.detect import compact_levels, dedup_octave, detect_level
from hesaff_tpu.ops.linalg import rectify_up_is_up
from hesaff_tpu.patches import bucket_for, extract_bucket_batch, patch_image_size
from hesaff_tpu.pipeline import ExtractStats, Features
from hesaff_tpu.pyramid import (
    build_octave,
    level_sigmas,
    octave_shapes,
    prepare_first_level,
)
from hesaff_tpu.sift import sift_descriptors


def _detect_affine_one(image: jnp.ndarray, cfg: HesaffConfig):
    """Single-image phase A: all octaves -> concatenated dense fields.

    Per octave: detect on the 3 levels (full masked capacity — cheap),
    dedup, then COMPACT the accepted keypoints across levels before the
    expensive affine stage (16 iterations x 361 bilinear gathers per
    keypoint only runs on real keypoints, not padding).
    """
    sig = level_sigmas(cfg)
    first, pd = prepare_first_level(image, cfg)
    fields = defaultdict(list)
    cur = first
    while (cur.shape[0] > cfg.min_octave_size
           and cur.shape[1] > cfg.min_octave_size):
        H, W = cur.shape
        o = build_octave(cur, pd, cfg)
        cap = cfg.level_capacity(H, W)
        levels = [
            detect_level(o.resps[l - 1], o.resps[l], o.resps[l + 1],
                         o.blurs[l], sig[l], pd, cap, cfg)
            for l in (1, 2, 3)
        ]
        levels = dedup_octave(levels, H, W)
        # compact post-dedup survivors so the affine stage's chunks are
        # densely packed (cond-skip then elides the padding tail)
        comp = compact_levels(levels, cfg.affine_capacity(H, W))

        safe = lambda a, d: jnp.where(comp["ok"], a, d)
        ar = adapt_compacted(
            o.blurs[:cfg.num_scales],          # prevBlur of levels 1..3
            comp["level"] - 1,
            safe(comp["x"], (W // 2) * pd), safe(comp["y"], (H // 2) * pd),
            safe(comp["s"], 2.0 * pd), pd, cfg,
            active=comp["ok"],
        )
        r11, r12, r21, r22 = rectify_up_is_up(ar.u11, ar.u12, ar.u21, ar.u22)
        fields["ok"].append(comp["ok"] & ar.ok)
        fields["det_ok"].append(comp["ok"])
        fields["x"].append(comp["x"])
        fields["y"].append(comp["y"])
        fields["s"].append(comp["s"])
        fields["response"].append(comp["response"])
        fields["type"].append(comp["type"])
        fields["a11"].append(r11)
        fields["a12"].append(r12)
        fields["a21"].append(r21)
        fields["a22"].append(r22)
        fields["overflow"].append(
            (comp["overflow"] + sum(lk.overflow for lk in levels))[None]
        )
        cur = o.next_first
        pd *= 2.0
    return {k: jnp.concatenate(v) for k, v in fields.items()}


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_affine_batch(images: jnp.ndarray, cfg: HesaffConfig):
    """Phase A over an image batch: (B, H, W) -> dict of (B, N_cap)."""
    return jax.vmap(lambda im: _detect_affine_one(im, cfg))(images)


@functools.partial(jax.jit, static_argnames=("bucket", "cfg"))
def _bucket_stage(images, bucket: int, img_idx, x, y, s,
                  a11, a12, a21, a22, active, cfg: HesaffConfig):
    return extract_bucket_batch(
        images, bucket, img_idx, x, y, s, a11, a12, a21, a22, cfg,
        active=active,
    )


def _pad_to(n: int, minimum: int = 64) -> int:
    return max(minimum, 1 << (n - 1).bit_length()) if n else minimum


def extract_batch(images, cfg: HesaffConfig = DEFAULT_CONFIG,
                  return_stats: bool = False):
    """Extract features from a batch of same-size images.

    images: (B, H, W) float32.  Returns a list of B Features (and a
    batch-level ExtractStats when return_stats is set).
    """
    images = jnp.asarray(images, jnp.float32)
    B = images.shape[0]
    out = detect_affine_batch(images, cfg)
    out = jax.tree.map(np.asarray, out)

    ok = out["ok"]                       # (B, N_cap)
    num_kp = int(out["det_ok"].sum())
    cand_overflow = int(out["overflow"].sum())

    # flatten accepted keypoints across the batch
    img_idx, slot = np.nonzero(ok)
    fields = {k: out[k][img_idx, slot]
              for k in ("x", "y", "s", "response", "type",
                        "a11", "a12", "a21", "a22")}
    n_aff = len(img_idx)

    patches = np.zeros((n_aff, cfg.patch_size, cfg.patch_size), np.float32)
    patch_ok = np.zeros(n_aff, bool)
    bucket_overflow = 0
    if n_aff:
        S = patch_image_size(fields["s"], cfg.mr_size)
        groups = defaultdict(list)
        for i, w in enumerate(S + 2):
            b = bucket_for(int(w))
            if b < 0:
                bucket_overflow += 1
                continue
            groups[b].append(i)
        for b, idx in sorted(groups.items()):
            idx = np.asarray(idx)
            npad = _pad_to(len(idx))
            sel = np.zeros(npad, np.int64)
            sel[: len(idx)] = idx
            pk, pok = _bucket_stage(
                images, b,
                jnp.asarray(img_idx[sel].astype(np.int32)),
                *(jnp.asarray(fields[k][sel]) for k in
                  ("x", "y", "s", "a11", "a12", "a21", "a22")),
                jnp.arange(npad) < len(idx),
                cfg,
            )
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

    feats_out = []
    di = img_idx[described]
    for bimg in range(B):
        m = di == bimg
        rows = described[m]
        feats_out.append(Features(
            x=fields["x"][rows], y=fields["y"][rows], s=fields["s"][rows],
            a11=fields["a11"][rows], a12=fields["a12"][rows],
            a21=fields["a21"][rows], a22=fields["a22"][rows],
            response=fields["response"][rows],
            type=fields["type"][rows].astype(np.int32),
            desc=descs[m],
        ))
    stats = ExtractStats(
        num_candidates=num_kp, num_keypoints=num_kp, num_affine=n_aff,
        num_described=n_desc, candidate_overflow=cand_overflow,
        bucket_overflow=bucket_overflow,
    )
    return (feats_out, stats) if return_stats else feats_out
