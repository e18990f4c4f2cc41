"""Multi-chip / multi-host scaling via jax.sharding.

The reference is strictly single-threaded (SURVEY.md §2.2); here
parallelism is first-class:

  * data parallelism: images sharded over a ("data",) mesh axis — the
    primary axis for extraction fleets (SURVEY.md §2.2 table);
  * `extraction_step`: a FULLY jittable fixed-capacity end-to-end step
    (detect + affine + in-graph bucketing + patches + SIFT, no host
    sync) used for sharded serving and the multi-chip dry-run.  Bucket
    capacities are static; overflow is counted and reported, never
    silent (SURVEY.md §7 hard part 2);
  * multi-host: `jax.distributed.initialize()` + the same NamedSharding
    program — XLA places collectives on ICI/DCN.

Matching/BA collectives (ring kNN, Schur reduction) live in match.py /
geom/ba.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hesaff_tpu.batch import detect_affine_batch
from hesaff_tpu.ops.batching import compact_indices
from hesaff_tpu.config import DEFAULT_CONFIG, HesaffConfig
from hesaff_tpu.patches import BUCKET_SIZES, extract_bucket_batch
from hesaff_tpu.sift import sift_descriptors


class DenseFeatures(NamedTuple):
    """Fixed-capacity extraction output (masked; shapes static)."""

    valid: jnp.ndarray     # (K,) bool
    img_idx: jnp.ndarray   # (K,) int32 index into the local image batch
    x: jnp.ndarray         # (K,)
    y: jnp.ndarray
    s: jnp.ndarray
    a11: jnp.ndarray
    a12: jnp.ndarray
    a21: jnp.ndarray
    a22: jnp.ndarray
    response: jnp.ndarray
    type: jnp.ndarray
    desc: jnp.ndarray      # (K, 128) uint8 quantized descriptors
    overflow: jnp.ndarray  # () int32 — keypoints dropped by capacity


def default_bucket_spec(height: int, width: int,
                        cfg: HesaffConfig = DEFAULT_CONFIG,
                        per_image_cap: int = 512,
                        batch: int = 1):
    """Static (bucket_size, capacity) list covering an image size.

    Buckets above min(H,W)+2 cannot survive the patch border check, so
    they are omitted.  Measured keypoint distributions (e.g. 200x160:
    {25:12 33:17 41:16 49:8 65:22 81:4 97:3 129:3 161:2}) concentrate in
    the first octave's four buckets plus the octave-2 bucket; capacities
    follow that shape and scale with the batch.  Overflow is counted by
    extraction_step, never silent.
    """
    limit = min(height, width) + 2
    total = per_image_cap * batch
    spec = []
    for i, b in enumerate(BUCKET_SIZES):
        # generous caps cost little: all-padding chunks skip at runtime
        if b <= 97:
            cap = total // 2
        elif b <= 193:
            cap = total // 8
        elif b <= 385:
            cap = max(64, total // 32)
        else:
            cap = max(32, total // 128)
        spec.append((b, cap))
        if b >= limit:
            break
    return tuple(spec)


@functools.partial(jax.jit, static_argnames=("cfg", "buckets"))
def extraction_step(images: jnp.ndarray, cfg: HesaffConfig,
                    buckets: Sequence[tuple]) -> DenseFeatures:
    """End-to-end extraction with zero host synchronization.

    images: (B, H, W) float32.  buckets: static ((size, capacity), ...)
    — see default_bucket_spec.  Scale capacities with B.

    Shardable: under a Mesh with images sharded on the batch axis, every
    stage partitions cleanly (phase A is per-image; bucketing/gather is
    the only cross-image step and XLA handles it with all-gathers of
    O(keypoint) scalars, not images).
    """
    B = images.shape[0]
    out = detect_affine_batch(images, cfg)
    out.pop("next_firsts", None)

    ncap = out["ok"].shape[1]
    flat = {k: v.reshape(-1) for k, v in out.items()
            if k not in ("overflow", "n_cand")}
    ok = flat["ok"]
    total = B * ncap

    mr_scale = jnp.ceil(flat["s"] * cfg.mr_size)
    S = 2 * mr_scale.astype(jnp.int32) + 1
    ws = S + 2

    ktotal = sum(c for _, c in buckets)
    feats = {
        k: jnp.zeros((ktotal,), flat[k].dtype)
        for k in ("x", "y", "s", "a11", "a12", "a21", "a22", "response")
    }
    feats["type"] = jnp.zeros((ktotal,), jnp.int32)
    fvalid = jnp.zeros((ktotal,), bool)
    fimg = jnp.zeros((ktotal,), jnp.int32)
    patches = jnp.zeros((ktotal, cfg.patch_size, cfg.patch_size), jnp.float32)

    overflow = jnp.sum(out["overflow"])
    offset = 0
    prev = 0
    for bsize, bcap in buckets:
        m = ok & (ws > prev) & (ws <= bsize)
        idx, valid, over_b = compact_indices(m, bcap)
        overflow = overflow + over_b
        gi = (idx // ncap).astype(jnp.int32)
        args = [flat[k][idx] for k in
                ("x", "y", "s", "a11", "a12", "a21", "a22")]
        pk, pok = extract_bucket_batch(
            images, bsize, gi, *args, cfg, active=valid, prev_bucket=prev
        )
        sl = slice(offset, offset + bcap)
        patches = patches.at[sl].set(pk)
        fvalid = fvalid.at[sl].set(valid & pok)
        fimg = fimg.at[sl].set(gi)
        for k in feats:
            feats[k] = feats[k].at[sl].set(flat[k][idx].astype(feats[k].dtype))
        offset += bcap
        prev = bsize

    # uint8 in-graph: quarters the host transfer through thin links
    descs = sift_descriptors(patches, cfg).astype(jnp.uint8)
    # keypoints above the largest bucket are dropped; count them
    overflow = overflow + jnp.sum(
        (ok & (ws > buckets[-1][0])).astype(jnp.int32)
    )
    return DenseFeatures(
        valid=fvalid, img_idx=fimg,
        x=feats["x"], y=feats["y"], s=feats["s"],
        a11=feats["a11"], a12=feats["a12"],
        a21=feats["a21"], a22=feats["a22"],
        response=feats["response"], type=feats["type"],
        desc=descs, overflow=overflow,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _phase_a_flat(images, cfg: HesaffConfig, valid_hw=None):
    """Phase A producing flattened per-keypoint fields (device-resident).

    Also returns the octave first levels (pyramid by-products) for the
    phase-B pyramid-tail patch source.  valid_hw: optional (B, 2) int32
    per-image TRUE dims when the batch is edge-padded to a shape bucket
    (mixed-size fleets) — detection scan windows and phase-B boundary
    checks then ride the true dims (batch.extract_batch contract)."""
    out = detect_affine_batch(images, cfg, valid_hw=valid_hw)
    levels = out.pop("next_firsts")
    flat = {k: v.reshape(-1) for k, v in out.items()
            if k not in ("overflow", "n_cand")}
    flat["overflow"] = jnp.sum(out["overflow"])
    return flat, levels


@functools.partial(jax.jit,
                   static_argnames=("cfg", "bsize", "bcap", "prev", "ncap"))
def _bucket_select_stage(images, flat, cfg: HesaffConfig, bsize: int,
                         bcap: int, prev: int, ncap: int):
    """In-graph bucket selection + patch extraction for one bucket."""
    ok = flat["ok"]
    mr_scale = jnp.ceil(flat["s"] * cfg.mr_size)
    ws = 2 * mr_scale.astype(jnp.int32) + 3
    m = ok & (ws > prev) & (ws <= bsize)
    idx, valid, over = compact_indices(m, bcap)
    gi = (idx // ncap).astype(jnp.int32)
    args = [flat[k][idx] for k in
            ("x", "y", "s", "a11", "a12", "a21", "a22")]
    pk, pok = extract_bucket_batch(images, bsize, gi, *args, cfg,
                                   active=valid, prev_bucket=prev)
    sel = {k: flat[k][idx] for k in
           ("x", "y", "s", "a11", "a12", "a21", "a22", "response")}
    sel["type"] = flat["type"][idx].astype(jnp.int32)
    return pk, valid & pok, gi, sel, over


@functools.partial(jax.jit, static_argnames=("cfg",))
def _describe_stage(patches, cfg: HesaffConfig):
    return sift_descriptors(patches, cfg).astype(jnp.uint8)


# fused-Pallas patch kernels fit the 16 MB scoped VMEM up to this
# bucket size (measured on v5e); larger groups fall back to XLA
_PALLAS_GROUP_MAX = 384

def default_group_spec(height: int, width: int,
                       cfg: HesaffConfig = DEFAULT_CONFIG,
                       per_image_cap: int = 512,
                       batch: int = 1):
    """Static (bucket, capacity) groups for the fused Pallas patch path.

    Far coarser than BUCKET_SIZES: the kernel's padding waste is VMEM
    compute, not HBM one-hot traffic, so a handful of groups beats 16+
    bucket stages (each stage is a dispatch through the slow tunnel).
    Capacities follow the measured keypoint distribution (~77% of
    keypoints have ws <= 49 on dense synthetic imagery).
    """
    limit = min(height, width) + 2
    total = per_image_cap * batch
    sizes = (49, 97, 193, 385, 641, 1025)
    # measured batch-16 800x640 dense-synthetic occupancy:
    # 18228/8601/2101/643/92/4 of 16384 slots -> fractions + ~13%
    # headroom.  Caps pool ACROSS the batch, so per-image variance
    # averages out; the round-3 era +35% headroom cost ~1.4 MB of
    # padding in every descriptor download (the serving bottleneck on
    # thin links — PERF.md round-4 transport analysis).  Overflow is
    # counted and reported, never silent.
    fracs = (1.26, 0.6, 0.15, 0.046, 0.0075, 0.002)
    spec = []
    for bsize, frac in zip(sizes, fracs):
        cap = max(32, int(total * frac))
        cap = ((cap + 31) // 32) * 32
        spec.append((bsize, cap))
        if bsize >= limit:
            break
    return tuple(spec)


def _sift_masked(patches, active, cfg: HesaffConfig, chunk: int = 1024):
    """sift_descriptors with runtime skip of all-padding chunks."""
    K = patches.shape[0]
    pad = (-K) % chunk
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad,) + patches.shape[1:], patches.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), active.dtype)])
    n = patches.shape[0] // chunk
    pc = patches.reshape(n, chunk, *patches.shape[1:])
    ac = active.reshape(n, chunk)

    if cfg.use_pallas and jax.default_backend() == "tpu":
        from hesaff_tpu.ops.pallas_sift import sift_descriptors_pallas
        describe = sift_descriptors_pallas
    else:
        describe = sift_descriptors

    def body(args):
        p, a = args
        return jax.lax.cond(
            jnp.any(a),
            lambda: describe(p, cfg).astype(jnp.uint8),
            lambda: jnp.zeros((chunk, 128), jnp.uint8),
        )

    out = jax.lax.map(body, (pc, ac))
    return out.reshape(-1, 128)[:K]


def _compact_and_gather(flat, m, bcap: int, ncap: int):
    """Compact the selection mask to bcap slots, shear-sort so the patch
    kernels' KB-blocks are shear-homogeneous (the narrow-band y-pass's
    all-slots-low cond engages per block), and gather keypoint fields."""
    idx, valid, over = compact_indices(m, bcap)
    order = jnp.argsort(jnp.where(valid, jnp.abs(flat["a21"][idx]),
                                  jnp.inf))
    idx = idx[order]
    valid = valid[order]
    gi = (idx // ncap).astype(jnp.int32)
    a = {k: flat[k][idx] for k in
         ("x", "y", "s", "a11", "a12", "a21", "a22", "response")}
    a["type"] = flat["type"][idx].astype(jnp.int32)
    return gi, a, valid, over


@functools.partial(jax.jit,
                   static_argnames=("cfg", "bsize", "bcap", "prev",
                                    "ncap", "mixed", "interpret"))
def _group_select_stage(images, flat, cfg: HesaffConfig, bsize: int,
                        bcap: int, prev: int, ncap: int, mixed: bool,
                        valid_hw=None, interpret: bool = False):
    """One group's selection + fused Pallas patch kernel (small jit)."""
    from hesaff_tpu.ops.pallas_patches import extract_group_pallas

    ok = flat["ok"]
    mr_scale = jnp.ceil(flat["s"] * cfg.mr_size)
    ws = 2 * mr_scale.astype(jnp.int32) + 3
    m = ok & (ws > prev) & (ws <= bsize)
    if mixed:
        its_all = (ws - 2).astype(jnp.float32) / cfg.patch_size
        m = m & ~(its_all <= cfg.oversample_cutoff)
    gi, a, valid, over = _compact_and_gather(flat, m, bcap, ncap)
    pk, pok = extract_group_pallas(
        images, bsize, gi, a["x"], a["y"], a["s"],
        a["a11"], a["a21"], a["a22"], cfg, active=valid,
        true_hw=valid_hw, interpret=interpret,
    )
    return pk, pok, gi, a, valid, over


@functools.partial(jax.jit, static_argnames=("cfg", "octave"))
def _scaled_level_stage(images, cfg: HesaffConfig, octave: int):
    """First level of pyramid octave `octave` for the batch (tail source)."""
    from hesaff_tpu.pyramid import scaled_first_level

    return scaled_first_level(images, cfg, octave)


def tail_source_plan(bsize: int, base_pd: float):
    """(ps, octave, bucket_src) for a pyramid-tail patch group.

    Picks the smallest downsample factor ps whose source workspace
    2*ceil((bsize-2)/(2 ps))+3 fits the fused kernel, the pyramid
    octave whose first level carries that ps (relative to base_pd=0.5
    under upscale_input), and the source-bucket size.  Single source of
    truth shared by extraction_step_grouped and bench's stage
    breakdown.
    """
    ps = 2.0
    while 2 * ((bsize - 2 + 2 * ps - 1) // (2 * ps)) + 3 \
            > _PALLAS_GROUP_MAX:
        ps *= 2.0
    octave = int(round(np.log2(ps / base_pd)))
    bucket_src = int(2 * -(-(bsize - 2) // (2 * ps)) + 3)
    return ps, octave, bucket_src


def tail_source_level(images, cfg: HesaffConfig, octave: int,
                      levels_a, cache: dict):
    """Octave-`octave` first level, reusing phase A's by-products.

    next_firsts[o-1] IS octave o's first level (no recompute); octaves
    deeper than phase A went are computed on demand and memoized in
    `cache`.
    """
    if octave not in cache:
        cache[octave] = (
            levels_a[octave - 1] if 0 <= octave - 1 < len(levels_a)
            else _scaled_level_stage(images, cfg, octave))
    return cache[octave]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "bsize", "bcap", "prev", "ncap",
                                    "ps", "bucket_src", "orig_hw",
                                    "interpret"))
def _tail_select_stage(images_src, flat, cfg: HesaffConfig, bsize: int,
                       bcap: int, prev: int, ncap: int, ps: float,
                       bucket_src: int, orig_hw, valid_hw=None,
                       interpret: bool = False):
    """Tail group: select ws in (prev, bsize] and extract patches from a
    downsampled pyramid level via the scaled Pallas kernel."""
    from hesaff_tpu.ops.pallas_patches import extract_group_pallas_scaled

    ok = flat["ok"]
    mr_scale = jnp.ceil(flat["s"] * cfg.mr_size)
    ws = 2 * mr_scale.astype(jnp.int32) + 3
    m = ok & (ws > prev) & (ws <= bsize)
    gi, a, valid, over = _compact_and_gather(flat, m, bcap, ncap)
    pk, pok = extract_group_pallas_scaled(
        images_src, ps, bucket_src, gi, a["x"], a["y"], a["s"],
        a["a11"], a["a21"], a["a22"], cfg, active=valid,
        orig_hw=orig_hw, true_hw=valid_hw, interpret=interpret,
    )
    return pk, pok, gi, a, valid, over


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dcap", "ncap"))
def _direct_branch_stage(images, flat, cfg: HesaffConfig, dcap: int,
                         ncap: int, valid_hw=None):
    """Direct-warp keypoints (its <= 0.4; affine.cpp:115,135)."""
    from hesaff_tpu.ops.batching import chunked_vmap
    from hesaff_tpu.ops.warp import check_borders
    from hesaff_tpu.patches import _direct_warp

    ok = flat["ok"]
    mr_scale = jnp.ceil(flat["s"] * cfg.mr_size)
    S = 2 * mr_scale.astype(jnp.int32) + 1
    its_all = S.astype(jnp.float32) / cfg.patch_size
    direct_m = ok & (its_all <= cfg.oversample_cutoff)
    idx, valid, over = compact_indices(direct_m, dcap)
    gi = (idx // ncap).astype(jnp.int32)
    a = {k: flat[k][idx] for k in
         ("x", "y", "s", "a11", "a12", "a21", "a22", "response")}
    a["type"] = flat["type"][idx].astype(jnp.int32)
    its_d = ((2 * jnp.ceil(a["s"] * cfg.mr_size).astype(jnp.int32) + 1)
             .astype(jnp.float32) / cfg.patch_size)
    H, W = images.shape[-2], images.shape[-1]
    if valid_hw is None:
        hk = jnp.full_like(gi, H)
        wk = jnp.full_like(gi, W)
    else:
        vhw = jnp.asarray(valid_hw, jnp.int32)
        hk = vhw[gi, 0]
        wk = vhw[gi, 1]
    cbad = jax.vmap(
        lambda hh, wwk, itss, b11, b21, b22, xx, yy: check_borders(
            hh, wwk, cfg.patch_size, cfg.patch_size, xx, yy,
            b11 * itss, 0.0, b21 * itss, b22 * itss,
        )
    )(hk, wk, its_d, a["a11"], a["a21"], a["a22"], a["x"], a["y"])
    pk, touched = chunked_vmap(
        lambda ii, xx, yy, b11, b21, b22, itss: _direct_warp(
            images, ii, xx, yy, b11, b21, b22, itss, cfg.patch_size
        ),
        (gi, a["x"], a["y"], a["a11"], a["a21"], a["a22"], its_d),
        max(8, min(dcap, 256)),
        active=valid,
    )
    return pk, valid & ~cbad & ~touched, gi, a, valid, over


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sift_masked_stage(patches, active, cfg: HesaffConfig):
    return _sift_masked(patches, active, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _grouped_overflow_tail(flat, cfg: HesaffConfig, last_bucket):
    ok = flat["ok"]
    ws = 2 * jnp.ceil(flat["s"] * cfg.mr_size).astype(jnp.int32) + 3
    return jnp.sum((ok & (ws > last_bucket)).astype(jnp.int32))


def extraction_step_grouped(images, cfg: HesaffConfig,
                            groups: Sequence[tuple],
                            valid_hw=None,
                            interpret: bool = False) -> DenseFeatures:
    """TPU fast path: phase A (fused-affine detection) + chained
    per-group fused-Pallas patch stages + masked SIFT.

    All stages chain device-resident (async dispatch, zero host syncs);
    each is a small, individually cached program — the one-giant-HLO
    variant took 30-60 min through the remote-compile tunnel.

    valid_hw: optional (B, 2) int32 per-image TRUE dims when the batch
    is edge-padded to a shape bucket (mixed-size fleets): detection
    windows and patch boundary checks ride the true dims, matching the
    batch.extract_batch padded-mode contract (near-edge windows may
    sample replicated pad instead of out-of-image zeros — the same
    documented tolerance).
    """
    from hesaff_tpu.patches import _min_workspace

    if valid_hw is not None:
        valid_hw = jnp.asarray(valid_hw, jnp.int32)
    flat, levels_a = _phase_a_flat(images, cfg, valid_hw=valid_hw)
    ncap = flat["x"].shape[0] // images.shape[0]

    mixed = (_min_workspace(cfg)
             <= cfg.oversample_cutoff * cfg.patch_size + 2)
    pieces = []
    overflow = flat["overflow"]
    prev = 0
    base_pd = 0.5 if cfg.upscale_input else 1.0
    levels = {}
    Ho, Wo = images.shape[-2], images.shape[-1]
    for bsize, bcap in groups:
        if bsize <= _PALLAS_GROUP_MAX:
            # fused Pallas patch kernel (window resident in VMEM)
            pk, pok, gi, a, valid, over = _group_select_stage(
                images, flat, cfg, bsize, bcap, prev, ncap, mixed,
                valid_hw=valid_hw, interpret=interpret)
            pieces.append((pk, pok, gi, a, valid))
        elif cfg.tail_from_pyramid:
            # large patches warp from a downsampled sigma0-blurred
            # pyramid level: the source workspace shrinks by ps, so the
            # fused kernel applies (and the work drops ~ps^2)
            ps, octave, bucket_src = tail_source_plan(bsize, base_pd)
            src = tail_source_level(images, cfg, octave, levels_a, levels)
            pk, pok, gi, a, valid, over = _tail_select_stage(
                src, flat, cfg, bsize, bcap, prev, ncap,
                ps, bucket_src, (Ho, Wo), valid_hw=valid_hw,
                interpret=interpret)
            pieces.append((pk, pok, gi, a, valid))
        else:
            # reference-literal path: full-resolution XLA bucket stage
            pk, pok, gi, sel, over = _bucket_select_stage(
                images, flat, cfg, bsize, bcap, prev, ncap)
            pieces.append((pk, pok, gi, sel, None))
        overflow = overflow + over
        prev = bsize
    overflow = overflow + _grouped_overflow_tail(flat, cfg, groups[-1][0])
    if mixed:
        dcap = max(64, groups[0][1] // 4)
        pk, pok, gi, a, valid, over = _direct_branch_stage(
            images, flat, cfg, dcap, ncap, valid_hw=valid_hw)
        pieces.append((pk, pok, gi, a, valid))
        overflow = overflow + over

    patches = jnp.concatenate([p[0] for p in pieces])
    pvalid = jnp.concatenate([p[1] for p in pieces])
    img_idx = jnp.concatenate([p[2] for p in pieces])
    fields = {k: jnp.concatenate([p[3][k] for p in pieces])
              for k in pieces[0][3]}
    descs = _sift_masked_stage(patches, pvalid, cfg)
    # NOTE on output layout: each piece's slots are near-prefix-valid
    # (the per-group compaction packs real keypoints first; only patch
    # border rejects leave holes).  Two transfer optimizations were
    # tried on hardware and REVERTED (round 4): device-side global
    # compaction (the (K, 128) row gather is an XLA gather, ~150 ms at
    # K=40k) and per-block prefix downloads (the tunnel is latency-
    # dominated at ~110 ms/round-trip, so 8 small transfers lose to
    # one 5 MB transfer).  Consumers should fetch `desc` in ONE piece.
    return DenseFeatures(
        valid=pvalid, img_idx=img_idx,
        x=fields["x"], y=fields["y"], s=fields["s"],
        a11=fields["a11"], a12=fields["a12"],
        a21=fields["a21"], a22=fields["a22"],
        response=fields["response"], type=fields["type"],
        desc=descs, overflow=overflow,
    )


def _phase_b_staged(images, flat, cfg: HesaffConfig,
                    buckets: Sequence[tuple]) -> DenseFeatures:
    """Phase B (bucketed patch extraction + SIFT) from phase-A outputs.

    Shared by extraction_step_staged (same-device chaining) and the
    pipeline-parallel extractor (where it runs on the stage-1 device
    group).  Platform-agnostic XLA path."""
    ncap = flat["x"].shape[0] // images.shape[0]  # static per-image slots
    overflow = flat["overflow"]
    pieces = []
    prev = 0
    for bsize, bcap in buckets:
        pk, pok, gi, sel, over = _bucket_select_stage(
            images, flat, cfg, bsize, bcap, prev, ncap
        )
        pieces.append((pk, pok, gi, sel))
        overflow = overflow + over
        prev = bsize

    patches = jnp.concatenate([p[0] for p in pieces])
    descs = _describe_stage(patches, cfg)
    valid = jnp.concatenate([p[1] for p in pieces])
    img_idx = jnp.concatenate([p[2] for p in pieces])
    fields = {
        k: jnp.concatenate([p[3][k] for p in pieces])
        for k in pieces[0][3]
    }
    mr_scale_ws_over = jnp.sum(
        (flat["ok"] & (2 * jnp.ceil(flat["s"] * cfg.mr_size
                                    ).astype(jnp.int32) + 3
                       > buckets[-1][0])).astype(jnp.int32)
    )
    return DenseFeatures(
        valid=valid, img_idx=img_idx,
        x=fields["x"], y=fields["y"], s=fields["s"],
        a11=fields["a11"], a12=fields["a12"],
        a21=fields["a21"], a22=fields["a22"],
        response=fields["response"], type=fields["type"],
        desc=descs, overflow=overflow + mr_scale_ws_over,
    )


def extraction_step_staged(images, cfg: HesaffConfig,
                           buckets: Sequence[tuple]) -> DenseFeatures:
    """Same result as extraction_step but as a chain of small jits.

    All intermediates stay on device (async dispatch chains without host
    syncs), so the tunnel round-trip cost stays at one upload + one
    download — while compile cost is a set of small, individually
    cached programs instead of one giant HLO.
    """
    flat, _ = _phase_a_flat(images, cfg)
    return _phase_b_staged(images, flat, cfg, buckets)


class PipelinedExtractor:
    """2-stage pipeline-parallel extraction over a (stage x data) device
    grid (SURVEY.md §2.2 "PP" row — net-new; the reference is
    single-threaded).

    Stage 0 devices run phase A (pyramid + DoH detection + affine
    adaptation); stage 1 devices run phase B (patch normalization +
    SIFT).  Within each stage, images shard over a ("data",) mesh axis.
    Microbatch t's phase-A outputs (per-keypoint scalars — tiny relative
    to images) reshard to the stage-1 group via `jax.device_put`, which
    XLA lowers to a device-to-device copy riding ICI; async dispatch
    keeps both groups busy on consecutive microbatches without any host
    round-trip between stages.

    This is the idiomatic JAX expression of heterogeneous-stage PP:
    placement + async streams, not ppermute (ppermute-rotation PP fits
    homogeneous repeated stages, e.g. transformer layers).  For this
    workload pure DP is usually preferred (both phases scale with image
    count); PP exists for serving topologies where the two phases have
    imbalanced resource profiles (e.g. phase B batching keypoints across
    many phase-A feeders) — and to complete the parallelism matrix.
    """

    def __init__(self, cfg: HesaffConfig, buckets: Sequence[tuple],
                 devices=None, data_parallel: int = 1):
        devs = list(jax.devices()) if devices is None else list(devices)
        if len(devs) < 2 * data_parallel:
            raise ValueError(
                f"pipeline needs 2*{data_parallel} devices, "
                f"have {len(devs)}")
        self.cfg = cfg
        self.buckets = tuple(buckets)
        self.mesh_a = Mesh(np.asarray(devs[:data_parallel]), ("data",))
        self.mesh_b = Mesh(
            np.asarray(devs[data_parallel:2 * data_parallel]), ("data",))
        self._sh_img_a = NamedSharding(self.mesh_a, P("data", None, None))
        self._sh_img_b = NamedSharding(self.mesh_b, P("data", None, None))
        self._sh_flat_b = NamedSharding(self.mesh_b, P())

        cfg_ = cfg
        self._step_a = jax.jit(
            lambda im: _phase_a_flat(im, cfg_)[0],
            in_shardings=(self._sh_img_a,))
        bks = self.buckets
        self._step_b = jax.jit(
            lambda im, flat: _phase_b_staged(im, flat, cfg_, bks),
            # single sharding = pytree prefix: applies to every flat leaf
            in_shardings=(self._sh_img_b, self._sh_flat_b))

    def __call__(self, batches, depth: int = 2):
        """Stream microbatches through the pipeline.

        batches: iterable of (B, H, W) float32 arrays (same static
        shape).  Yields one DenseFeatures per microbatch, in order.
        `depth` bounds in-flight microbatches (2 = classic double
        buffering: stage 1 works on t while stage 0 works on t+1).
        """
        inflight = []
        for imgs in batches:
            im_a = jax.device_put(jnp.asarray(imgs), self._sh_img_a)
            flat = self._step_a(im_a)
            # stage handoff: keypoint scalars + images hop to the
            # stage-1 group (ICI device-to-device, no host round-trip)
            flat_b = jax.device_put(flat, self._sh_flat_b)
            im_b = jax.device_put(im_a, self._sh_img_b)
            inflight.append(self._step_b(im_b, flat_b))
            while len(inflight) > depth:
                out = inflight.pop(0)
                jax.block_until_ready(out)
                yield out
        for out in inflight:
            jax.block_until_ready(out)
            yield out


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (jax.distributed).

    On TPU pods the arguments auto-detect from the environment; pass
    them explicitly for CPU/GPU clusters.  After this, jax.devices()
    spans the slice and the NamedSharding programs in this module place
    collectives on ICI/DCN (SURVEY.md §5 communication backend).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(items, process_index: int | None = None,
               process_count: int | None = None):
    """Partition a work list across hosts by index (host h takes
    items[h::n]) — the standard per-host sharding for extraction fleets."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sharded_extraction_step(mesh: Mesh, cfg: HesaffConfig,
                            buckets: Sequence[tuple], axis: str = "data"):
    """Return a jitted extraction step with images sharded over `axis`.

    The output DenseFeatures' keypoint axis is replicated (gathered) —
    keypoint arrays are tiny relative to images.
    """
    in_sharding = NamedSharding(mesh, P(axis, None, None))

    def step(images):
        return extraction_step(images, cfg, buckets)

    return jax.jit(step, in_shardings=(in_sharding,)), in_sharding
