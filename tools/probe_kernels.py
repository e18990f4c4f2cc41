"""Compile-probe every Pallas kernel on the attached TPU.

The driver toolchain (libtpu / Mosaic) can update between rounds and
regress lowering of individual ops (round 2 ended with vector<i1>
scf.yield carries and atan2 both failing to legalize).  This probe
compiles each kernel entry point with small real inputs and reports
ok/fail per kernel so a regression is attributed in seconds instead of
through multi-minute full-pipeline compiles.

Usage: python tools/probe_kernels.py [--only blur,affine,...]
Exit code = number of failed kernels.
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _smooth(rng, shape):
    a = rng.normal(128, 40, shape).astype(np.float32)
    for _ in range(6):
        for ax in (-1, -2):
            a = (a + np.roll(a, 1, ax)) * 0.5
    return a


def probe_blur(jnp):
    from hesaff_tpu.ops.blur import gaussian_taps
    from hesaff_tpu.ops.pallas_blur import blur_doh

    rng = np.random.RandomState(0)
    img = jnp.asarray(_smooth(rng, (96, 128)))
    taps = tuple(float(t) for t in gaussian_taps(1.2))
    blur, resp = blur_doh(img, taps, float(1.6**4))
    np.asarray(blur)


def probe_blur_tiled(jnp):
    from hesaff_tpu.ops.blur import gaussian_taps
    from hesaff_tpu.ops.pallas_blur import blur_doh_tiled

    rng = np.random.RandomState(1)
    img = jnp.asarray(_smooth(rng, (611, 470)))
    taps = tuple(float(t) for t in gaussian_taps(2.46))
    blur, resp = blur_doh_tiled(img, taps, float(3.2**4))
    np.asarray(blur)


def probe_detect(jnp):
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.ops.pallas_detect import detect_maps_pallas

    cfg = HesaffConfig()
    rng = np.random.RandomState(3)
    low, cur, high = (jnp.asarray(_smooth(rng, (160, 256)) - 128.0)
                      for _ in range(3))
    r = cfg.edge_eigenvalue_ratio
    out = detect_maps_pallas(low, cur, high, cfg.border,
                             0.8 * cfg.threshold**2,
                             -0.8 * cfg.threshold**2,
                             float((r + 1.0) ** 2 / r))
    np.asarray(out[0])


def probe_affine(jnp):
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.ops.pallas_affine import adapt_flat_pallas

    cfg = HesaffConfig()
    rng = np.random.RandomState(4)
    B, L, H, W = 1, 2, 160, 256
    stacks = jnp.asarray(_smooth(rng, (B, L, H, W)))
    K = 16
    x = jnp.asarray(rng.uniform(40, W - 40, K).astype(np.float32))
    y = jnp.asarray(rng.uniform(40, H - 40, K).astype(np.float32))
    s = jnp.full((K,), 2.2, jnp.float32)
    img_idx = jnp.zeros((K,), jnp.int32)
    src_level = jnp.zeros((K,), jnp.int32)
    res = adapt_flat_pallas(stacks, img_idx, src_level, x, y, s, 1.0, cfg)
    np.asarray(res.u11)


def probe_patches(jnp):
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.ops.pallas_patches import extract_group_pallas

    cfg = HesaffConfig()
    rng = np.random.RandomState(5)
    B, H, W = 1, 160, 256
    images = jnp.asarray(_smooth(rng, (B, H, W)))
    K, bucket = 8, 33
    x = jnp.asarray(rng.uniform(40, W - 40, K).astype(np.float32))
    y = jnp.asarray(rng.uniform(40, H - 40, K).astype(np.float32))
    s = jnp.full((K,), 2.8, jnp.float32)
    a11 = jnp.ones((K,), jnp.float32)
    a21 = jnp.zeros((K,), jnp.float32)
    a22 = jnp.ones((K,), jnp.float32)
    img_idx = jnp.zeros((K,), jnp.int32)
    active = jnp.ones((K,), bool)
    patches, ok = extract_group_pallas(images, bucket, img_idx, x, y, s,
                                       a11, a21, a22, cfg, active)
    np.asarray(ok)


def probe_sift(jnp):
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.ops.pallas_sift import sift_descriptors_pallas

    cfg = HesaffConfig()
    rng = np.random.RandomState(6)
    patches = jnp.asarray(
        np.clip(_smooth(rng, (8, cfg.patch_size, cfg.patch_size)), 0, 255))
    d = sift_descriptors_pallas(patches, cfg)
    np.asarray(d)


PROBES = {
    "blur": probe_blur,
    "blur_tiled": probe_blur_tiled,
    "detect": probe_detect,
    "affine": probe_affine,
    "patches": probe_patches,
    "sift": probe_sift,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated probe names (default: all)")
    ap.add_argument("--env", default="",
                    help="comma-separated KEY=VAL pairs set before "
                         "importing hesaff_tpu (module-scope flags)")
    args = ap.parse_args()
    for pair in args.env.split(","):
        if "=" in pair:
            k, v = pair.split("=", 1)
            os.environ[k] = v

    import jax
    import jax.numpy as jnp

    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    names = ([n.strip() for n in args.only.split(",") if n.strip()]
             or list(PROBES))
    failed = 0
    for name in names:
        try:
            PROBES[name](jnp)
            print(f"ok   {name}")
        except Exception as e:
            failed += 1
            first = str(e).splitlines()[0][:160] if str(e) else ""
            print(f"FAIL {name}: {type(e).__name__}: {first}")
            if os.environ.get("PROBE_VERBOSE"):
                traceback.print_exc()
    sys.exit(failed)


if __name__ == "__main__":
    main()
