"""Measure the FAST_CONFIG speed profile's accuracy cost.

Runs the Oxford-Affine repeatability protocol (synthetic sequences,
same scorer as OXFORD.md) with the DEFAULT (reference-parity) config
and the FAST profile (13x13 SMM window), and writes FAST.md with the
per-pair deltas.  The fast profile is only worth shipping if the
repeatability/matching-score cost is small and DOCUMENTED — this tool
is that document's source.

Usage: python tools/fast_eval.py [--outdir /tmp/oxford_fast]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/oxford_fast")
    ap.add_argument("--kinds", nargs="*",
                    default=["viewpoint", "zoomrot", "blur"])
    ap.add_argument("--views", type=int, default=6)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import oxford_synth

    from hesaff_tpu.config import DEFAULT_CONFIG, FAST_CONFIG
    from hesaff_tpu.evaluate import (features_to_ellipses, repeatability)
    from hesaff_tpu.pipeline import extract
    from hesaff_tpu.sift_io import load_image_gray

    def run(img_path, cfg):
        img = load_image_gray(img_path)
        f = extract(img, cfg)
        return (features_to_ellipses(f, cfg.mr_size),
                np.asarray(f.desc), img.shape)

    seqs = oxford_synth.build_sequences(args.outdir, kinds=args.kinds)
    rows = []
    for kind, seq in seqs.items():
        p1, _ = seq[0]
        d_e1, d_d1, shape1 = run(p1, DEFAULT_CONFIG)
        f_e1, f_d1, _ = run(p1, FAST_CONFIG)
        for k in range(2, min(args.views, len(seq)) + 1):
            pk, hp = seq[k - 1]
            H = np.loadtxt(hp)
            d_ek, d_dk, shapek = run(pk, DEFAULT_CONFIG)
            f_ek, f_dk, _ = run(pk, FAST_CONFIG)
            rd = repeatability(d_e1, d_ek, H, shapek, d_d1, d_dk,
                               shape1=shape1)
            rf = repeatability(f_e1, f_ek, H, shapek, f_d1, f_dk,
                               shape1=shape1)
            rows.append((kind, k, rd, rf))
            print(f"{kind} 1->{k}: default rep={rd.repeatability:.3f} "
                  f"ms={rd.matching_score:.3f} (n={rd.n1}/{rd.n2}) | "
                  f"fast rep={rf.repeatability:.3f} "
                  f"ms={rf.matching_score:.3f} (n={rf.n1}/{rf.n2})",
                  flush=True)

    drep = [rf.repeatability - rd.repeatability for _, _, rd, rf in rows]
    dms = [rf.matching_score - rd.matching_score for _, _, rd, rf in rows]
    lines = [
        "# FAST profile accuracy (13x13 SMM window vs reference 19x19)",
        "",
        "Oxford-Affine repeatability protocol on the synthetic",
        "sequences (tools/oxford_synth.py), both configs scored by the",
        "certified overlap scorer (tests/test_evaluate.py).  The FAST",
        "profile trades reference parity for ~53% less affine-stage",
        "sampling work (cost is quadratic in the SMM window side); the",
        "DEFAULT config remains the parity contract.",
        "",
        "| sequence | pair | default rep | fast rep | default ms "
        "| fast ms | default n1/n2 | fast n1/n2 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for kind, k, rd, rf in rows:
        lines.append(
            f"| {kind} | 1-{k} | {rd.repeatability:.3f} "
            f"| {rf.repeatability:.3f} | {rd.matching_score:.3f} "
            f"| {rf.matching_score:.3f} | {rd.n1}/{rd.n2} "
            f"| {rf.n1}/{rf.n2} |")
    lines += [
        "",
        f"Mean repeatability delta: {np.mean(drep):+.4f} "
        f"(worst {np.min(drep):+.4f}); mean matching-score delta: "
        f"{np.mean(dms):+.4f} (worst {np.min(dms):+.4f}).",
    ]
    with open(os.path.join(REPO, "FAST.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote FAST.md")


if __name__ == "__main__":
    main()
