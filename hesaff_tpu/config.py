"""Frozen configuration — the compatibility contract with the reference.

Defaults reproduce the reference's four parameter structs exactly:
PyramidParams (/root/reference/pyramid.h:18-41), AffineShapeParams
(/root/reference/affine.h:17-46), SIFTDescriptorParams
(/root/reference/siftdesc.h:19-32) and the driver's HessianAffineParams
plumbing (/root/reference/hesaff.cpp:21-36,150-163).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class HesaffConfig:
    # --- detection (PyramidParams, /root/reference/pyramid.h:32-40) ---
    threshold: float = 16.0 / 3.0          # DoH response threshold (pre-square)
    edge_eigenvalue_ratio: float = 10.0    # edge rejection ratio
    border: int = 5                        # pixels ignored at image border
    num_scales: int = 3                    # scales per octave
    initial_sigma: float = 1.6             # blur of first level of each octave
    upscale_input: bool = False            # 2x upscale before pyramid

    # --- affine adaptation (AffineShapeParams, /root/reference/affine.h:37-45) ---
    max_iterations: int = 16               # Baumberg iteration cap
    convergence_threshold: float = 0.05    # 1 - l2/l1 isotropy deviation
    smm_window_size: int = 19              # second-moment-matrix window
    anisotropy_max: float = 6.0            # abort when l1/l2 exceeds this

    # --- description (SIFTDescriptorParams + driver defaults) ---
    patch_size: int = 41                   # normalized patch side
    mr_size: float = 3.0 * math.sqrt(3.0)  # measurement region scale multiple
    spatial_bins: int = 4
    orientation_bins: int = 8
    max_bin_value: float = 0.2             # SIFT clip value
    oversample_cutoff: float = 0.4         # imageToPatchScale branch point
    patch_smooth_factor: float = 1.5       # anti-alias blur sigma multiplier

    # --- localization constants (/root/reference/pyramid.cpp:117-120) ---
    max_subpixel_shift: float = 0.6
    point_safety_border: int = 3
    localize_iterations: int = 5
    final_shift_limit: float = 1.5         # reject if any |b| exceeds this

    # --- TPU framework knobs (no reference equivalent) ---
    # per-(octave,level) candidate capacity: min(cap_max, max(cap_min, H*W//cap_div))
    candidate_cap_min: int = 64
    candidate_cap_max: int = 2048
    candidate_cap_div: int = 128
    # fused Pallas blur+DoH kernel for the pyramid ladder (TPU only;
    # falls back to the XLA path on other backends / oversized images)
    use_pallas: bool = True
    # warp LARGE patches (workspace > the Pallas group limit) from a
    # downsampled sigma0-blurred pyramid level with a blur-composition-
    # corrected anti-alias sigma, instead of the full-resolution image
    # (SURVEY.md §7 hard-part 1 option (b)).  Numerically equivalent up
    # to resampling (validated vs the full-res path in tests); OFF
    # reproduces the reference pipeline literally via the XLA path.
    tail_from_pyramid: bool = True
    # per-octave capacity of the post-dedup compacted keypoint set that
    # the (expensive) affine stage runs on — levels share this budget
    affine_cap_min: int = 128
    affine_cap_max: int = 4096
    affine_cap_div: int = 256
    dtype: str = "float32"

    # --- derived (reference: HessianDetector ctor, pyramid.h:59-68) ---
    @property
    def final_threshold(self) -> float:
        return self.threshold * self.threshold

    @property
    def positive_threshold(self) -> float:
        return 0.8 * self.final_threshold

    @property
    def negative_threshold(self) -> float:
        return -self.positive_threshold

    @property
    def edge_score_threshold(self) -> float:
        r = self.edge_eigenvalue_ratio
        return (r + 1.0) * (r + 1.0) / r

    @property
    def sigma_step(self) -> float:
        return 2.0 ** (1.0 / self.num_scales)

    @property
    def min_octave_size(self) -> int:
        return 2 * self.border + 2

    def num_octaves(self, height: int, width: int) -> int:
        """Octave count replicating the while-loop at pyramid.cpp:284-291."""
        if self.upscale_input:
            height, width = height * 2, width * 2
        n = 0
        while height > self.min_octave_size and width > self.min_octave_size:
            n += 1
            height //= 2
            width //= 2
        return n

    def level_capacity(self, height: int, width: int,
                       octave: int = 0) -> int:
        """Fixed candidate capacity for one detection level of an octave.

        The divisor halves per octave (floor 32): measured candidate
        density per PIXEL roughly quadruples per octave on textured
        imagery (blobs exist at every scale while pixels shrink 4x), so
        a flat divisor under-sizes octave 1+ and silently-counted
        overflow drops real keypoints.
        """
        div = max(self.candidate_cap_div >> octave, 32)
        cap = max(self.candidate_cap_min, (height * width) // div)
        return min(self.candidate_cap_max, cap)

    def octave_candidate_capacity(self, height: int, width: int) -> int:
        """Pre-localization candidate capacity for a whole octave (all
        detection levels compacted together)."""
        cap = max(256, (height * width) // 96)
        return min(2 * self.candidate_cap_max, cap)

    def affine_capacity(self, height: int, width: int,
                        octave: int = 0) -> int:
        """Compacted per-octave keypoint capacity for affine adaptation.

        Octave-scaled like level_capacity (density grows per octave)."""
        div = max(self.affine_cap_div >> octave, 48)
        cap = max(self.affine_cap_min, (height * width) // div)
        return min(self.affine_cap_max, cap)


DEFAULT_CONFIG = HesaffConfig()

# Documented fast mode (NOT the default; the parity defaults above are
# the compatibility contract).  Rounds 4-5 measured that cutting
# arithmetic volume (smaller SMM windows, lower-precision sampling)
# does NOT move the affine stage — it is bound by the per-iteration
# serial overhead — so the only levers that buy real time are the ones
# that cut ITERATIONS: a looser convergence threshold (keypoints stop
# earlier) and a tighter iteration cap (stragglers, which bound the
# packed loop, stop dominating).  Semantics change vs
# /root/reference/affine.h:39-44; the accuracy delta is published next
# to the speed number (OXFORD.md fast-mode table + PERF.md row).
FAST_CONFIG = HesaffConfig(max_iterations=10,
                           convergence_threshold=0.10)

