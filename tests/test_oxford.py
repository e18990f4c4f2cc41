"""Oxford-Affine protocol gate: hesaff_tpu vs the reference binary.

Reduced version of tools/oxford_eval.py (one viewpoint sequence, two
pairs, 320x240) — both detectors run on identical images and score
through the same repeatability implementation; the gate is that our
repeatability and detection counts track the reference's.  Skipped when
the OpenCV toolchain for the oracle build is unavailable.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

_have_opencv = (shutil.which("pkg-config") is not None and
                subprocess.run(["pkg-config", "--exists", "opencv4"],
                               capture_output=True).returncode == 0)


@pytest.mark.skipif(not _have_opencv,
                    reason="OpenCV dev headers needed for the oracle build")
def test_repeatability_tracks_reference(tmp_path):
    import oxford_eval
    import oxford_synth

    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.evaluate import repeatability

    cfg = HesaffConfig()
    work = str(tmp_path)
    seqs = oxford_synth.build_sequences(work, width=320, height=240,
                                        kinds=("viewpoint",))
    binpath = oxford_eval.build_reference(work)

    seq = seqs["viewpoint"]
    r1, rd1 = oxford_eval.ref_extract(binpath, seq[0][0])
    o1, od1, shape1 = oxford_eval.our_extract(seq[0][0], cfg)
    assert abs(len(o1) - len(r1)) <= max(3, 0.03 * len(r1))

    for k in (2, 4):
        pk, hp = seq[k - 1]
        H = np.loadtxt(hp)
        rk, rdk = oxford_eval.ref_extract(binpath, pk)
        ok, odk, shapek = oxford_eval.our_extract(pk, cfg)
        rr = repeatability(r1, rk, H, shapek, rd1, rdk, shape1=shape1)
        ro = repeatability(o1, ok, H, shapek, od1, odk, shape1=shape1)
        assert rr.repeatability > 0.5          # protocol sanity
        assert abs(ro.repeatability - rr.repeatability) < 0.03, (rr, ro)
        assert abs(ro.matching_score - rr.matching_score) < 0.03, (rr, ro)
