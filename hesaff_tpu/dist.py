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

from hesaff_tpu.batch import _detect_affine_one
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
    desc: jnp.ndarray      # (K, 128) float32 (quantized values)
    overflow: jnp.ndarray  # () int32 — keypoints dropped by capacity


def default_bucket_spec(height: int, width: int,
                        cfg: HesaffConfig = DEFAULT_CONFIG,
                        per_image_cap: int = 512):
    """Static (bucket_size, capacity) list covering an image size.

    Buckets above min(H,W)+2 cannot survive the patch border check, so
    they are omitted.  Capacities fall off geometrically: keypoint
    counts drop ~4x per octave while patch sizes double.
    """
    limit = min(height, width) + 2
    spec = []
    cap = per_image_cap
    for b in BUCKET_SIZES:
        spec.append((b, max(32, cap)))
        cap //= 2
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
    out = jax.vmap(lambda im: _detect_affine_one(im, cfg))(images)

    ncap = out["ok"].shape[1]
    flat = {k: v.reshape(-1) for k, v in out.items() if k != "overflow"}
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
        n = jnp.sum(m.astype(jnp.int32))
        (idx,) = jnp.nonzero(m, size=bcap, fill_value=0)
        valid = jnp.arange(bcap) < n
        overflow = overflow + jnp.maximum(n - bcap, 0)
        gi = (idx // ncap).astype(jnp.int32)
        args = [flat[k][idx] for k in
                ("x", "y", "s", "a11", "a12", "a21", "a22")]
        pk, pok = extract_bucket_batch(
            images, bsize, gi, *args, cfg
        )
        sl = slice(offset, offset + bcap)
        patches = patches.at[sl].set(pk)
        fvalid = fvalid.at[sl].set(valid & pok)
        fimg = fimg.at[sl].set(gi)
        for k in feats:
            feats[k] = feats[k].at[sl].set(flat[k][idx].astype(feats[k].dtype))
        offset += bcap
        prev = bsize

    descs = sift_descriptors(patches, cfg)
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
