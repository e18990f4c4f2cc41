"""hesaff_tpu — TPU-native Hessian-Affine + SIFT feature & geometry engine.

A brand-new JAX/XLA/Pallas implementation of the full capability set of the
classic ``perdoch/hesaff`` detector (reference: /root/reference), built
TPU-first: dense staged pipelines over fixed-capacity masked keypoint
buffers instead of the reference's per-keypoint callback control flow
(/root/reference/hesaff.cpp:50-105), batched/vmapped per-keypoint math,
MXU-formulated SIFT binning, and jax.sharding-based multi-chip scaling.

Public API
----------
    HesaffConfig      — frozen parameter set (compat contract with reference)
    extract           — single-image extraction -> Features
    Features          — SoA keypoint record (x, y, s, A, response, type, desc)
    write_sift_file / read_sift_file — Oxford ".hesaff.sift" text format
"""

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.pipeline import Features, extract
from hesaff_tpu.sift_io import read_sift_file, write_sift_file

__version__ = "0.1.0"

__all__ = [
    "HesaffConfig",
    "Features",
    "extract",
    "read_sift_file",
    "write_sift_file",
]
