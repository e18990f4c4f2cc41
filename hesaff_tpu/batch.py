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

from hesaff_tpu.config import DEFAULT_CONFIG, HesaffConfig
from hesaff_tpu.detect import (compact_levels, dedup_octave, detect_level,
                               detect_octave_batch)
from hesaff_tpu.ops.linalg import rectify_up_is_up
from hesaff_tpu.patches import (
    BUCKET_SIZES,
    bucket_for,
    extract_bucket_batch,
    patch_image_size,
)
from hesaff_tpu.pipeline import ExtractStats, Features
from hesaff_tpu.pyramid import (
    build_octave,
    level_sigmas,
    prepare_first_level,
)
from hesaff_tpu.sift import sift_descriptors


def _detect_one_octave(resps, blurs, sig, pd: float, cfg: HesaffConfig,
                       valid_hw=None, octave: int = 0):
    """Per-image detection for one octave -> compacted keypoint dict."""
    H, W = resps.shape[-2], resps.shape[-1]
    cap = cfg.level_capacity(H, W, octave)
    levels = [
        detect_level(resps[l - 1], resps[l], resps[l + 1],
                     blurs[l], sig[l], pd, cap, cfg, valid_hw=valid_hw)
        for l in (1, 2, 3)
    ]
    levels = dedup_octave(levels, H, W)
    comp = compact_levels(levels, cfg.affine_capacity(H, W, octave))
    comp["overflow"] = comp["overflow"] + sum(lk.overflow for lk in levels)
    comp["n_cand"] = sum(lk.n_cand for lk in levels)
    return comp


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_affine_batch(images: jnp.ndarray, cfg: HesaffConfig,
                        valid_hw=None):
    """Phase A over an image batch: (B, H, W) -> dict of (B, N_cap).

    Pyramid + detection vmap per image; the expensive affine stage runs
    once per octave over the CROSS-IMAGE flattened compacted keypoints —
    outside the vmap, so its chunked cond-skip genuinely elides padding
    (a vmapped lax.cond executes both branches).

    valid_hw: optional traced (B, 2) int32 — per-image TRUE dims when
    the batch is edge-padded to a shape bucket (mixed-size fleets reuse
    one compiled program per bucket instead of one per exact size).
    Detection scan windows use the true dims per octave, so padding
    creates no extra keypoints; see utils/fleet for the bucketing.
    """
    from hesaff_tpu.affine_shape import adapt_flat

    B = images.shape[0]
    sig = level_sigmas(cfg)

    def prep(im):
        first, _ = prepare_first_level(im, cfg)
        return first

    cur = jax.vmap(prep)(images)
    pd = 0.5 if cfg.upscale_input else 1.0
    vhw = None
    if valid_hw is not None:
        vhw = jnp.asarray(valid_hw, jnp.int32)
        if cfg.upscale_input:
            vhw = vhw * 2

    fields = defaultdict(list)
    next_firsts = []
    octave = 0
    while (cur.shape[-2] > cfg.min_octave_size
           and cur.shape[-1] > cfg.min_octave_size):
        H, W = cur.shape[-2], cur.shape[-1]

        def oct_fn(f):
            o = build_octave(f, pd, cfg)
            return o.blurs, o.resps, o.next_first

        blurs, resps, nxt = jax.vmap(oct_fn)(cur)
        # flat cross-image walks: per-level capacities are worst-case
        # sized, so per-image walk slots are ~90% padding — the batch
        # path compacts candidates of all images/levels together and
        # runtime-skips the padding chunks (detect.detect_octave_batch)
        comp = detect_octave_batch(resps, blurs, sig, pd, cfg,
                                   octave=octave, valid_hw=vhw)
        if vhw is not None:
            # the true pyramid halves dims per octave (halfImage
            # floor-divides; floors compose: h//2//2 == h//4)
            vhw = vhw // 2

        cap = comp["ok"].shape[1]
        flat = {k: v.reshape(-1) for k, v in comp.items()
                if k not in ("overflow", "n_cand")}
        img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), cap)
        safe = lambda a, d: jnp.where(flat["ok"], a, d)
        ar = adapt_flat(
            blurs[:, :cfg.num_scales],      # prevBlur of levels 1..3
            img_idx,
            flat["level"] - 1,
            safe(flat["x"], (W // 2) * pd), safe(flat["y"], (H // 2) * pd),
            safe(flat["s"], 2.0 * pd), pd, cfg,
            active=flat["ok"],
        )
        r11, r12, r21, r22 = rectify_up_is_up(ar.u11, ar.u12, ar.u21, ar.u22)
        shp = (B, cap)
        fields["ok"].append((flat["ok"] & ar.ok).reshape(shp))
        fields["det_ok"].append(flat["ok"].reshape(shp))
        for k in ("x", "y", "s", "response", "type"):
            fields[k].append(flat[k].reshape(shp))
        fields["a11"].append(r11.reshape(shp))
        fields["a12"].append(r12.reshape(shp))
        fields["a21"].append(r21.reshape(shp))
        fields["a22"].append(r22.reshape(shp))
        fields["overflow"].append(comp["overflow"][:, None])
        fields["n_cand"].append(comp["n_cand"][:, None])
        next_firsts.append(nxt)
        cur = nxt
        pd *= 2.0
        octave += 1
    out = {k: jnp.concatenate(v, axis=1) for k, v in fields.items()}
    # downsampled sigma0-blurred first levels (free by-products of the
    # octave loop) — phase B's pyramid-tail patch source
    out["next_firsts"] = next_firsts
    return out


@functools.partial(jax.jit, static_argnames=("bucket", "prev_bucket", "cfg"))
def _bucket_stage(images, bucket: int, prev_bucket: int, img_idx, x, y, s,
                  a11, a12, a21, a22, active, cfg: HesaffConfig,
                  valid_hw=None):
    return extract_bucket_batch(
        images, bucket, img_idx, x, y, s, a11, a12, a21, a22, cfg,
        active=active, prev_bucket=prev_bucket, valid_hw=valid_hw,
    )


def _pad_to(n: int, minimum: int = 64) -> int:
    return max(minimum, 1 << (n - 1).bit_length()) if n else minimum


def extract_batch(images, cfg: HesaffConfig = DEFAULT_CONFIG,
                  return_stats: bool = False, valid_hw=None):
    """Extract features from a batch of same-size images.

    images: (B, H, W) float32.  Returns a list of B Features (and a
    batch-level ExtractStats when return_stats is set).

    valid_hw: optional (B, 2) int32 per-image TRUE dims when the batch
    is edge-padded to a shape bucket (mixed-size fleets; see
    utils/fleet.pad_to_bucket).  Detection and the patch boundary check
    then use the true dims, so padded extraction matches the unpadded
    run (exact scan windows; near-edge affine windows may sample
    replicated pad instead of the reference's out-of-image zeros —
    a documented tolerance of the padded mode).
    """
    images = jnp.asarray(images, jnp.float32)
    if valid_hw is not None:
        valid_hw = jnp.asarray(valid_hw, jnp.int32)
    B = images.shape[0]
    out = detect_affine_batch(images, cfg, valid_hw=valid_hw)
    out.pop("next_firsts", None)
    out = jax.tree.map(np.asarray, out)

    ok = out["ok"]                       # (B, N_cap)
    num_kp = int(out["det_ok"].sum())
    num_cand = int(out["n_cand"].sum())
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
            bi = BUCKET_SIZES.index(b)
            pk, pok = _bucket_stage(
                images, b, BUCKET_SIZES[bi - 1] if bi else 0,
                jnp.asarray(img_idx[sel].astype(np.int32)),
                *(jnp.asarray(fields[k][sel]) for k in
                  ("x", "y", "s", "a11", "a12", "a21", "a22")),
                jnp.arange(npad) < len(idx),
                cfg, valid_hw=valid_hw,
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
        num_candidates=num_cand, num_keypoints=num_kp, num_affine=n_aff,
        num_described=n_desc, candidate_overflow=cand_overflow,
        bucket_overflow=bucket_overflow,
    )
    return (feats_out, stats) if return_stats else feats_out
