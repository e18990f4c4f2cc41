"""Run the Oxford-Affine repeatability protocol: reference binary vs
hesaff_tpu on the synthetic benchmark sequences (tools/oxford_synth.py).

Both detectors run on identical PPM inputs; both outputs go through the
SAME protocol implementation (hesaff_tpu.evaluate.repeatability), so the
comparison isolates detector/descriptor quality, not protocol details.
The reference binary is built out-of-tree from /root/reference with the
2-line OpenCV shim (SURVEY.md preamble).

Usage: python tools/oxford_eval.py [--outdir /tmp/oxford] [--platform cpu]
Writes OXFORD.md at the repo root.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def build_reference(work: str) -> str:
    """Build the reference hesaff binary (oracle) out-of-tree."""
    shim = os.path.join(work, "shim")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "cv.h"), "w") as f:
        f.write("#include <opencv2/opencv.hpp>\n#include <string.h>\n")
    with open(os.path.join(shim, "highgui.h"), "w") as f:
        f.write("#include <opencv2/highgui/highgui.hpp>\n")
    binpath = os.path.join(work, "hesaff_ref")
    if not os.path.exists(binpath):
        subprocess.run(
            f"g++ -O3 -w -I {shim} -I {REF} {REF}/hesaff.cpp "
            f"{REF}/pyramid.cpp {REF}/helpers.cpp {REF}/affine.cpp "
            f"{REF}/siftdesc.cpp $(pkg-config opencv4 --cflags --libs) "
            f"-lrt -o {binpath}",
            shell=True, check=True,
        )
    return binpath


def ref_extract(binpath: str, img: str):
    """Run the reference binary -> (ell (N,5), desc (N,128) uint8)."""
    from hesaff_tpu.sift_io import read_sift_file

    out = img + ".hesaff.sift"
    if not os.path.exists(out):
        subprocess.run([binpath, img], check=True, capture_output=True)
    d = read_sift_file(out)
    ell = np.stack([d["u"], d["v"], d["e00"], d["e01"], d["e11"]], axis=1)
    return ell, np.asarray(d["desc"], np.uint8)


def our_extract(img_path: str, cfg):
    from hesaff_tpu.evaluate import features_to_ellipses
    from hesaff_tpu.pipeline import extract
    from hesaff_tpu.sift_io import load_image_gray

    img = load_image_gray(img_path)
    f = extract(img, cfg)
    return features_to_ellipses(f, cfg.mr_size), np.asarray(f.desc), img.shape


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/oxford")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for deterministic runs)")
    ap.add_argument("--kinds", nargs="*",
                    default=["viewpoint", "zoomrot", "blur", "illum",
                             "jpeg"])
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--fast", action="store_true",
                    help="evaluate config.FAST_CONFIG for OUR detector "
                         "and APPEND a fast-mode accuracy table to "
                         "OXFORD.md (the parity table stays the main "
                         "contract)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import oxford_synth

    from hesaff_tpu.config import FAST_CONFIG, HesaffConfig
    from hesaff_tpu.evaluate import repeatability

    cfg = FAST_CONFIG if args.fast else HesaffConfig()
    seqs = oxford_synth.build_sequences(args.outdir, kinds=args.kinds)
    binpath = build_reference(args.outdir)

    rows = []
    for kind, seq in seqs.items():
        p1, _ = seq[0]
        r_ell1, r_d1 = ref_extract(binpath, p1)
        o_ell1, o_d1, shape1 = our_extract(p1, cfg)
        for k in range(2, min(args.views, len(seq)) + 1):
            pk, hp = seq[k - 1]
            H = np.loadtxt(hp)
            r_ellk, r_dk = ref_extract(binpath, pk)
            o_ellk, o_dk, shapek = our_extract(pk, cfg)
            rr = repeatability(r_ell1, r_ellk, H, shapek, r_d1, r_dk,
                               shape1=shape1)
            ro = repeatability(o_ell1, o_ellk, H, shapek, o_d1, o_dk,
                               shape1=shape1)
            rows.append((kind, k, rr, ro))
            print(f"{kind} 1->{k}: ref rep={rr.repeatability:.3f} "
                  f"ms={rr.matching_score:.3f} (n={rr.n1}/{rr.n2}) | "
                  f"ours rep={ro.repeatability:.3f} "
                  f"ms={ro.matching_score:.3f} (n={ro.n1}/{ro.n2})")

    if args.fast:
        lines = [
            "",
            "## Fast mode (config.FAST_CONFIG: max_iterations=10, "
            "convergence_threshold=0.10)",
            "",
            "Same protocol, OUR detector in the documented fast mode "
            "(NOT the parity contract; semantics differ from "
            "/root/reference/affine.h:39-44).  Speed numbers: PERF.md "
            "fast-mode row.",
            "",
            "| sequence | pair | ref rep | fast rep | ref match-score "
            "| fast match-score | ref n1/n2 | fast n1/n2 |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for kind, k, rr, ro in rows:
            lines.append(
                f"| {kind} | 1-{k} | {rr.repeatability:.3f} "
                f"| {ro.repeatability:.3f} | {rr.matching_score:.3f} "
                f"| {ro.matching_score:.3f} | {rr.n1}/{rr.n2} "
                f"| {ro.n1}/{ro.n2} |")
        gaps = [rr.repeatability - ro.repeatability
                for _, _, rr, ro in rows]
        lines += [
            "",
            f"Mean rep delta vs reference: {np.mean(gaps):+.3f} "
            f"(max {max(gaps):+.3f}).",
        ]
        with open(os.path.join(REPO, "OXFORD.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"appended fast-mode table to OXFORD.md ({len(rows)} pairs)")
        return

    lines = [
        "# Oxford-Affine protocol: reference binary vs hesaff_tpu",
        "",
        "Synthetic VGG-style sequences (tools/oxford_synth.py — no image",
        "egress in this environment; geometry is exact by construction),",
        "both detectors scored by hesaff_tpu.evaluate.repeatability",
        "(overlap error < 40%, common-region restricted, greedy 1:1).",
        "Reference anchor: /root/reference/README:31-44.",
        "",
        "| sequence | pair | ref rep | ours rep | ref match-score "
        "| ours match-score | ref n1/n2 | ours n1/n2 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for kind, k, rr, ro in rows:
        lines.append(
            f"| {kind} | 1-{k} | {rr.repeatability:.3f} "
            f"| {ro.repeatability:.3f} | {rr.matching_score:.3f} "
            f"| {ro.matching_score:.3f} | {rr.n1}/{rr.n2} "
            f"| {ro.n1}/{ro.n2} |")
    gaps = [abs(rr.repeatability - ro.repeatability) for _, _, rr, ro in rows]
    lines += [
        "",
        f"Max |ref - ours| repeatability gap: {max(gaps):.3f} "
        f"(mean {np.mean(gaps):.3f}).",
    ]
    with open(os.path.join(REPO, "OXFORD.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote OXFORD.md ({len(rows)} pairs)")


if __name__ == "__main__":
    main()
