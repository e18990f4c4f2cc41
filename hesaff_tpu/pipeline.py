"""End-to-end extraction driver (under construction)."""

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


def extract(image, cfg=None):  # pragma: no cover - placeholder
    raise NotImplementedError("pipeline wiring lands with detect/affine/sift")
