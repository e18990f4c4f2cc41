"""Fleet extraction: checkpoints, resume, per-image failure isolation."""

import json
import os

import numpy as np

from hesaff_tpu.utils.fleet import extract_fleet
from tests.golden.gen_images import synth_image, write_ppm


def _write_images(tmp_path, n=3):
    paths = []
    for i in range(n):
        p = str(tmp_path / f"img{i}.ppm")
        write_ppm(p, synth_image(96, 80, seed=i))
        paths.append(p)
    return paths


def test_fleet_extract_and_resume(tmp_path):
    paths = _write_images(tmp_path)
    out = str(tmp_path / "out")
    cursor = extract_fleet(paths, out, batch_size=2, log=lambda s: None)
    assert len(cursor["done"]) == 3
    assert not cursor["failed"]
    for p in paths:
        base = os.path.splitext(os.path.basename(p))[0]
        d = np.load(os.path.join(out, base + ".npz"))
        assert d["desc"].shape[1] == 128

    # resume: nothing left to do, cursor unchanged
    cursor2 = extract_fleet(paths, out, batch_size=2, log=lambda s: None)
    assert sorted(cursor2["done"]) == sorted(cursor["done"])


def test_fleet_isolates_bad_image(tmp_path):
    paths = _write_images(tmp_path, n=2)
    bad = str(tmp_path / "corrupt.ppm")
    with open(bad, "wb") as f:
        f.write(b"P6\n10 10\n255\nshort")  # truncated payload
    all_paths = [paths[0], bad, paths[1]]
    out = str(tmp_path / "out")
    cursor = extract_fleet(all_paths, out, batch_size=3,
                           log=lambda s: None)
    assert sorted(cursor["done"]) == sorted(paths)
    assert bad in cursor["failed"]
    # cursor persisted
    with open(os.path.join(out, "cursor.json")) as f:
        saved = json.load(f)
    assert bad in saved["failed"]
