"""Gaussian scale-space ladder + DoH response stacks.

Replicates the reference's pyramid schedule
(/root/reference/pyramid.cpp:224-292) as dense staged arrays: each octave
produces a (num_scales+2, H, W) blur stack and matching DoH stack in one
shot, and the next octave seeds from the level at sigma = 2*initial_sigma
via unfiltered 2x subsampling (pyramid.cpp:251-253).

All sigmas are static Python floats (shapes and taps bake into the jitted
program); octave shapes halve, so an image gets one XLA program with the
octave loop unrolled.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops.blur import gaussian_blur_traced, gaussian_taps
from hesaff_tpu.ops.hessian import hessian_response
from hesaff_tpu.ops.resample import double_image, half_image


class Octave(NamedTuple):
    blurs: jnp.ndarray      # (num_scales+2, H, W) blur ladder
    resps: jnp.ndarray      # (num_scales+2, H, W) DoH responses
    sigmas: tuple           # per-level sigma (static floats)
    pixel_distance: float   # image pixels per octave pixel
    next_first: jnp.ndarray  # seed level for the next octave (H//2, W//2)


def level_sigmas(cfg: HesaffConfig) -> list[float]:
    step = cfg.sigma_step
    return [cfg.initial_sigma * step**k for k in range(cfg.num_scales + 2)]


def prepare_first_level(image: jnp.ndarray, cfg: HesaffConfig):
    """Initial blur to sigma0 (assumes input sigma = 0.5; pyramid.cpp:261-280).

    Returns (first_level, pixel_distance).
    """
    cur_sigma = 0.5
    pd = 1.0
    first = image
    if cfg.upscale_input:
        first = double_image(first)
        pd *= 0.5
        cur_sigma *= 2.0
    if cfg.initial_sigma > cur_sigma:
        sigma = math.sqrt(cfg.initial_sigma**2 - cur_sigma**2)
        first = gaussian_blur_traced(first, jnp.asarray(gaussian_taps(sigma)))
    return first, pd


def scaled_first_level(images: jnp.ndarray, cfg: HesaffConfig,
                       octave: int) -> jnp.ndarray:
    """First level of pyramid octave `octave` for a batch (..., H, W).

    Rebuilds the blur ladder seed chain (pyramid.cpp:251-253, 284-291)
    without DoH responses — used by the phase-B tail to warp large
    patches from a downsampled, sigma0-blurred level instead of the
    full-resolution image (SURVEY.md §7 hard-part 1 option (b)).
    The result carries blur sigma0 in its own pixels, i.e.
    sigma0 * 2^octave in input pixels (1.6 absorbs the assumed 0.5).
    """
    first, _ = prepare_first_level(images, cfg)
    sig = level_sigmas(cfg)
    step = cfg.sigma_step
    cur = first
    for _ in range(octave):
        for i in range(cfg.num_scales):
            inc = sig[i] * math.sqrt(step * step - 1.0)
            cur = gaussian_blur_traced(cur, jnp.asarray(gaussian_taps(inc)))
        cur = half_image(cur)
    return cur


def build_octave(first_level: jnp.ndarray, pixel_distance: float,
                 cfg: HesaffConfig) -> Octave:
    """One octave's blur + DoH stacks (pyramid.cpp:224-258 schedule).

    On TPU the ladder uses the fused Pallas blur+DoH kernel (one VMEM
    pass per level instead of separate HBM round-trips).
    """
    import jax

    from hesaff_tpu.ops import pallas_blur

    sigmas = level_sigmas(cfg)
    step = cfg.sigma_step
    H, W = first_level.shape[-2], first_level.shape[-1]
    use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
    whole = pallas_blur.fits_vmem(H, W)

    # (a whole-ladder single-pass Pallas chain was built and A/B'd on
    # chip in round 3: 38.8k vs 52.7k desc/s — one mega-kernel
    # serialized what XLA overlaps across levels; deleted, see PERF.md)
    blurs = [first_level]
    resps = [hessian_response(first_level, sigmas[0] ** 2)]
    for i in range(cfg.num_scales + 1):
        inc = sigmas[i] * math.sqrt(step * step - 1.0)
        taps = gaussian_taps(inc)
        if use_pallas:
            fused = (pallas_blur.blur_doh if whole
                     else pallas_blur.blur_doh_tiled)
            b, r = fused(
                blurs[-1], tuple(float(t) for t in taps),
                float(sigmas[i + 1] ** 4),
            )
        else:
            b = gaussian_blur_traced(blurs[-1], jnp.asarray(taps))
            r = hessian_response(b, sigmas[i + 1] ** 2)
        blurs.append(b)
        resps.append(r)
    next_first = half_image(blurs[cfg.num_scales])
    return Octave(
        blurs=jnp.stack(blurs),
        resps=jnp.stack(resps),
        sigmas=tuple(sigmas),
        pixel_distance=pixel_distance,
        next_first=next_first,
    )


def octave_shapes(height: int, width: int, cfg: HesaffConfig):
    """Static (H, W, pixel_distance) schedule for an input image size."""
    if cfg.upscale_input:
        height, width = height * 2, width * 2
        pd = 0.5
    else:
        pd = 1.0
    out = []
    while height > cfg.min_octave_size and width > cfg.min_octave_size:
        out.append((height, width, pd))
        height //= 2
        width //= 2
        pd *= 2.0
    return out
