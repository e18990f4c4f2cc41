"""Command-line interface.

``python -m hesaff_tpu.cli extract image.ppm`` reproduces the reference
binary's contract (/root/reference/hesaff.cpp:133-180): writes
``<image>.hesaff.sift`` and prints the detection summary line.
Additional subcommands (match, eval) land with those subsystems.
"""

from __future__ import annotations

import argparse
import sys
import time


def _cmd_extract(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.pipeline import extract
    from hesaff_tpu.sift_io import load_image_gray, write_sift_file

    cfg = HesaffConfig(
        threshold=args.threshold,
        max_iterations=args.max_iter,
    )
    gray = load_image_gray(args.image)
    t0 = time.perf_counter()
    feats, stats = extract(jnp.asarray(gray), cfg, return_stats=True)
    elapsed = time.perf_counter() - t0
    out = args.output or (args.image + ".hesaff.sift")
    write_sift_file(
        out, feats.x, feats.y, feats.s,
        feats.a11, feats.a12, feats.a21, feats.a22,
        feats.desc, cfg.mr_size,
    )
    # summary line format follows the reference driver (hesaff.cpp:168)
    print(
        f"Detected {stats.num_keypoints} keypoints and {stats.num_described} "
        f"affine shapes in {elapsed:.6g} sec."
    )
    if stats.candidate_overflow or stats.bucket_overflow:
        print(
            f"warning: capacity overflow (candidates={stats.candidate_overflow}"
            f", buckets={stats.bucket_overflow})",
            file=sys.stderr,
        )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="hesaff_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="detect + describe one image")
    pe.add_argument("image")
    pe.add_argument("-o", "--output", default=None)
    pe.add_argument("--threshold", type=float, default=16.0 / 3.0)
    pe.add_argument("--max-iter", type=int, default=16)
    pe.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu)")
    pe.set_defaults(fn=_cmd_extract)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
