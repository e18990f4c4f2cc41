"""End-to-end extraction driver (single-image API).

The staged architecture lives in batch.py (phase A: detection + affine
as one jit; phase B: cross-batch bucketed patches + SIFT); this module
provides the single-image convenience API and the output records.
Replaces the reference's callback-wired AffineHessianDetector
(/root/reference/hesaff.cpp:50-105).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


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
    g_numberOfAffinePoints, hesaff.cpp:38-39, plus capacity-overflow
    diagnostics — overflow must be observable, never silent)."""

    num_candidates: int
    num_keypoints: int
    num_affine: int
    num_described: int
    candidate_overflow: int
    bucket_overflow: int


def extract(image, cfg=None, return_stats: bool = False):
    """Full Hessian-Affine + SIFT extraction on one grayscale image.

    image: (H, W) float32 grayscale (0..255 scale).  Returns Features
    (keypoints in the reference's octave/level/scan emission order), or
    (Features, ExtractStats) when return_stats is set.
    """
    import jax.numpy as jnp

    from hesaff_tpu.batch import extract_batch
    from hesaff_tpu.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    image = jnp.asarray(image, jnp.float32)
    out = extract_batch(image[None], cfg, return_stats=return_stats)
    if return_stats:
        feats, stats = out
        return feats[0], stats
    return out[0]
