"""End-to-end golden tests: extract() vs the oracle's .hesaff.sift."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from hesaff_tpu import HesaffConfig, extract
from hesaff_tpu.sift_io import ellipse_abc, read_sift_file, write_sift_file
from tests.conftest import parse_sift_bytes

CFG = HesaffConfig()


def test_end_to_end_matches_oracle(golden_small):
    gu, gv, ge, gdesc = parse_sift_bytes(golden_small["sift_file"])
    feats, stats = extract(jnp.asarray(golden_small["gray"]), CFG,
                           return_stats=True)
    assert stats.candidate_overflow == 0
    assert stats.bucket_overflow == 0

    e00, e01, e11 = ellipse_abc(
        feats.a11.astype(np.float64), feats.a12.astype(np.float64),
        feats.a21.astype(np.float64), feats.a22.astype(np.float64),
        feats.s.astype(np.float64), CFG.mr_size,
    )
    matched = 0
    for i in range(len(gu)):
        dd = np.hypot(feats.x - gu[i], feats.y - gv[i])
        j = int(dd.argmin())
        if dd[j] < 0.5:
            matched += 1
            ell = np.array([e00[j], e01[j], e11[j]])
            rel = np.abs(ell - ge[i]).max() / max(np.abs(ge[i]).max(), 1e-12)
            assert rel < 0.02, f"ellipse mismatch at oracle kp {i}"
            l1 = np.abs(feats.desc[j].astype(np.int32) - gdesc[i]).mean()
            assert l1 < 0.5, f"descriptor mismatch at oracle kp {i}"
    assert matched >= 0.97 * len(gu)
    assert abs(feats.n - len(gu)) <= max(2, 0.02 * len(gu))


def test_extract_flat_image_empty():
    feats = extract(np.full((64, 64), 9.0, np.float32), CFG)
    assert feats.n == 0
    assert feats.desc.shape == (0, 128)


def test_sift_file_roundtrip(tmp_path, golden_small):
    feats = extract(jnp.asarray(golden_small["gray"]), CFG)
    path = str(tmp_path / "out.sift")
    write_sift_file(path, feats.x, feats.y, feats.s, feats.a11, feats.a12,
                    feats.a21, feats.a22, feats.desc, CFG.mr_size)
    back = read_sift_file(path)
    assert len(back["u"]) == feats.n
    np.testing.assert_allclose(back["u"], feats.x, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(back["desc"], feats.desc)


def test_cli_extract(tmp_path, golden_small):
    src = os.path.join(os.path.dirname(__file__), "golden", "data",
                       "synth_200x160.ppm")
    out = str(tmp_path / "cli.sift")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-m", "hesaff_tpu.cli", "extract", src,
         "-o", out, "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "Detected" in r.stdout
    gu, gv, ge, gdesc = parse_sift_bytes(golden_small["sift_file"])
    back = read_sift_file(out)
    assert abs(len(back["u"]) - len(gu)) <= max(2, 0.02 * len(gu))
