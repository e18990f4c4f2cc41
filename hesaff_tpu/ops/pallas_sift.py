"""Pallas TPU kernel: fused SIFT descriptor (photometric norm +
gradients + trilinear binning + normalize/clip/quantize).

The XLA path (sift.sift_descriptors) materializes the per-pixel
orientation-split tensor (K, P, P, 8) — ~2 GB written and re-read per
dense batch, the stage's real cost.  This kernel processes patches in
a TRANSPOSED (pixel, keypoint) layout: each grid step holds a
(P*P, 128) block in VMEM (128 patches in the lanes), so every
elementwise op amortizes across 128 patches and the 8 orientation
planes never touch HBM.  Per-patch HBM traffic drops to one patch read
plus 128 floats out.

Numerics mirror sift.sift_descriptors exactly (same formulas per
/root/reference/siftdesc.cpp:51-140, helpers.cpp:246-281); binning
matmuls run at HIGHEST (bf16x6) like the XLA einsums.  Gradient
neighbours in the flat layout are sublane shifts (+-1 for x, +-P for
y) with constant-mask fixups for the one-sided patch edges.

Descriptor bins are produced in (orientation, spatial-pair) order —
contiguous 16-row stores per orientation plane — and permuted back to
the reference's (pair, orientation) order by the XLA wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hesaff_tpu.ops.pallas_util import round_up as _round_up

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.ops import masks

_KL = 128   # patches per grid step (one lane tile)

# atan(t) ~= t * P(t^2) on [0, 1]: degree-17 odd least-squares fit on
# Chebyshev nodes; |err| <= 1.2e-7 rad in f32 Horner evaluation — an
# orientation-weight error ~1.5e-7, three orders below the 1/512
# descriptor quantization step.  Needed because Mosaic has no atan2
# lowering (jnp.arctan2 raises NotImplementedError in Pallas TPU).
_ATAN_COEFFS = (
    0.9999999, -0.33332658, 0.19986537, -0.14164333, 0.1050732,
    -0.07247951, 0.03989956, -0.014458697, 0.0024682467,
)


def _atan2_poly(y, x):
    """Octant-reduced polynomial atan2 matching np.arctan2 to ~1e-7 rad.

    atan2(0, 0) returns 0 (reference semantics: zero-magnitude pixels
    contribute val=0, but the orientation must stay finite so 0*w
    doesn't turn NaN).  The +/-pi boundary may differ in sign from the
    libm result; orientation-bin space is 2*pi-periodic so binning is
    unaffected.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    t = num / jnp.where(den == 0.0, 1.0, den)
    z2 = t * t
    acc = jnp.full_like(t, _ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * z2 + c
    r = acc * t
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _spatial_pair_matrix(P: int, sb: int) -> np.ndarray:
    """(sb*sb, P*P) constant: S2[br*sb+bc, r*P+c] = W[r,br] * W[c,bc]."""
    W = masks.sift_spatial_bins(P, sb)                  # (P, sb)
    S2 = np.einsum("rb,cd->bdrc", W, W).reshape(sb * sb, P * P)
    return S2.astype(np.float32)


def _make_kernel(P: int, PPp: int, cfg: HesaffConfig):
    PP = P * P
    sb = cfg.spatial_bins
    ob = cfg.orientation_bins
    nb = sb * sb
    circ = masks.circular_gauss_mask(P).reshape(PP)
    n_support = float((circ > 0).sum())
    two_pi = 2.0 * np.pi

    def kernel(x_ref, msk_ref, s2_ref, c0_ref, c1_ref, r0_ref, r1_ref,
               out_ref):
        x = x_ref[:]                                   # (PPp, KL)
        msk = msk_ref[:]                               # (PPp, 1)
        supp = (msk > 0).astype(jnp.float32)

        # photometric normalization over the binary support disc
        # (helpers.cpp:246-281)
        mean = jnp.sum(x * supp, axis=0, keepdims=True) / n_support
        var = jnp.sqrt(jnp.sum(supp * (mean - x) ** 2, axis=0,
                               keepdims=True) / n_support)
        fac = 50.0 / var
        xn = jnp.clip(128.0 + fac * (x - mean), 0.0, 255.0)
        x = jnp.where(var < 0.0001, x, xn)

        # unhalved central-difference gradients, one-sided at patch
        # edges (siftdesc.cpp:123-137); +-1 / +-P sublane shifts with
        # constant-mask fixups where the shift crosses a patch edge
        def shup(a, d):   # row p reads p+d
            return jnp.concatenate([a[d:], a[-d:]], axis=0)

        def shdn(a, d):   # row p reads p-d
            return jnp.concatenate([a[:d], a[:-d]], axis=0)

        c0 = c0_ref[:]    # (PPp, 1) 1.0 where c == 0
        c1 = c1_ref[:]    # 1.0 where c == P-1
        r0 = r0_ref[:]
        r1 = r1_ref[:]
        gx = (x * c1 + (1.0 - c1) * shup(x, 1)) \
            - (x * c0 + (1.0 - c0) * shdn(x, 1))
        gy = (x * r1 + (1.0 - r1) * shup(x, P)) \
            - (x * r0 + (1.0 - r0) * shdn(x, P))
        mag = jnp.sqrt(gx * gx + gy * gy)
        ori = _atan2_poly(gy, gx)
        val = msk * mag

        # orientation split (siftdesc.cpp:64-72)
        o = ob * (ori + 2.0 * np.pi) / two_pi
        bo0 = jnp.floor(o)
        w1 = o - bo0
        b0 = bo0.astype(jnp.int32) % ob
        b1 = jnp.where(b0 + 1 == ob, 0, b0 + 1)

        s2 = s2_ref[:]                                 # (nb, PPp)
        planes = []
        nrm = jnp.zeros((1, _KL), jnp.float32)
        for obin in range(ob):
            w_o = val * (jnp.where(b0 == obin, 1.0 - w1, 0.0)
                         + jnp.where(b1 == obin, w1, 0.0))
            d16 = jax.lax.dot_general(
                s2, w_o, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (nb, KL)
            planes.append(d16)
            nrm = nrm + jnp.sum(d16 * d16, axis=0, keepdims=True)

        # L2 normalize -> clip 0.2 -> conditional renorm -> quantize
        # (siftdesc.cpp:98-113)
        norm = jnp.sqrt(nrm)
        planes = [p / norm for p in planes]
        changed = jnp.zeros((1, _KL), jnp.bool_)
        nrm2 = jnp.zeros((1, _KL), jnp.float32)
        clipped = []
        for p in planes:
            cp = jnp.minimum(p, cfg.max_bin_value)
            changed = changed | jnp.any(p > cfg.max_bin_value, axis=0,
                                        keepdims=True)
            nrm2 = nrm2 + jnp.sum(cp * cp, axis=0, keepdims=True)
            clipped.append(cp)
        norm2 = jnp.sqrt(nrm2)
        for obin in range(ob):
            f = jnp.where(changed, clipped[obin] / norm2, clipped[obin])
            q = jnp.minimum(jnp.floor(512.0 * f), 255.0)
            out_ref[obin * nb:(obin + 1) * nb, :] = q

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def sift_descriptors_pallas(patches: jnp.ndarray, cfg: HesaffConfig,
                            interpret: bool = False):
    """Drop-in fused-kernel variant of sift.sift_descriptors.

    patches: (K, P, P) float32 -> (K, 128) float32 quantized values.
    """
    K, P, _ = patches.shape
    sb = cfg.spatial_bins
    ob = cfg.orientation_bins
    nb = sb * sb
    PP = P * P
    PPp = _round_up(PP, 8)
    Kp = _round_up(max(K, 1), _KL)

    xt = patches.reshape(K, PP).T                       # (PP, K)
    xt = jnp.pad(xt, ((0, PPp - PP), (0, Kp - K)))

    circ = masks.circular_gauss_mask(P).reshape(PP, 1)
    col = lambda a: jnp.asarray(
        np.pad(a.astype(np.float32).reshape(PP, 1),
               ((0, PPp - PP), (0, 0))))
    pidx = np.arange(PP)
    rr, cc = pidx // P, pidx % P
    s2 = jnp.asarray(np.pad(_spatial_pair_matrix(P, sb),
                            ((0, 0), (0, PPp - PP))))

    kernel = _make_kernel(P, PPp, cfg)
    out = pl.pallas_call(
        kernel,
        grid=(Kp // _KL,),
        in_specs=[
            pl.BlockSpec((PPp, _KL), lambda g: (0, g)),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # circ mask
            pl.BlockSpec(memory_space=pltpu.VMEM),     # S2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # c == 0
            pl.BlockSpec(memory_space=pltpu.VMEM),     # c == P-1
            pl.BlockSpec(memory_space=pltpu.VMEM),     # r == 0
            pl.BlockSpec(memory_space=pltpu.VMEM),     # r == P-1
        ],
        out_specs=pl.BlockSpec((ob * nb, _KL), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((ob * nb, Kp), jnp.float32),
        interpret=interpret,
    )(xt, col(circ), s2, col(cc == 0), col(cc == P - 1),
      col(rr == 0), col(rr == P - 1))

    # kernel emits bins in (orientation, spatial-pair) order; the
    # reference order is pair*ob + o (siftdesc.cpp:55-76)
    perm = np.arange(nb * ob).reshape(nb, ob).T.reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return out[:, :K].T[:, jnp.asarray(inv)]
