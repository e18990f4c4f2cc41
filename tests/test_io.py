"""Image decode tests: native PNM/PNG decoders vs PIL ground truth.

The reference accepts anything cv::imread reads (hesaff.cpp:137); the
native host runtime covers PNM + 8-bit PNG (every color type) with the
parity-critical equal-weight (R+G+B)/3 gray conversion, and unsupported
variants fall back to PIL with a clear error when PIL is absent.
"""

import numpy as np
import pytest

from hesaff_tpu import native
from hesaff_tpu.sift_io import load_image_gray

PIL = pytest.importorskip("PIL.Image")


@pytest.mark.parametrize("mode", ["RGB", "L", "RGBA", "P"])
def test_native_png_matches_pil(tmp_path, mode):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (37, 53, 3), np.uint8)
    im = PIL.fromarray(arr, "RGB").convert(mode)
    path = str(tmp_path / f"img_{mode}.png")
    im.save(path)
    with open(path, "rb") as f:
        nat = native.decode_png_gray(f.read())
    assert nat is not None, "native PNG decoder did not engage"
    ref = np.asarray(im.convert("RGB"), np.float32).mean(-1)
    np.testing.assert_allclose(nat, ref, atol=1e-4)
    np.testing.assert_allclose(load_image_gray(path), ref, atol=1e-4)


def test_native_png_rejects_16bit(tmp_path):
    arr16 = np.full((8, 8), 1000, np.uint16)
    path = str(tmp_path / "img16.png")
    PIL.fromarray(arr16).save(path)
    with open(path, "rb") as f:
        assert native.decode_png_gray(f.read()) is None  # -> PIL fallback
    out = load_image_gray(path)       # PIL path still decodes it
    assert out.shape == (8, 8)


def test_native_pnm_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, (21, 31, 3), np.uint8)
    path = str(tmp_path / "img.ppm")
    with open(path, "wb") as f:
        f.write(b"P6\n31 21\n255\n" + rgb.tobytes())
    out = load_image_gray(path)
    np.testing.assert_allclose(
        out, rgb.astype(np.float32).mean(-1), atol=1e-4)


def test_prefetch_loader_order_parity_and_fallback(tmp_path):
    """Native threaded prefetch loader: strict input order, pixel parity
    with load_image_gray + pad_to_bucket, None for undecodable files."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    from hesaff_tpu.utils.fleet import pad_to_bucket

    rng = np.random.RandomState(7)
    paths = []
    for i in range(9):
        if i == 2:
            # dims already multiples of the pad bucket: the no-pad
            # branch must trim the oversized PNM decode buffer (a 3x
            # overrun of the caller's h*w floats otherwise)
            h, w = 128, 192
        else:
            h, w = int(rng.randint(40, 200)), int(rng.randint(40, 200))
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / f"im{i}.ppm")
        with open(p, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (w, h) + img.tobytes())
        paths.append(p)
    bad = str(tmp_path / "bad.ppm")
    with open(bad, "wb") as f:
        f.write(b"P6 garbage")
    paths.insert(4, bad)

    with native.PrefetchLoader(paths, threads=3, queue_cap=4) as loader:
        out = list(loader)
    assert [p for p, _, _ in out] == paths
    for p, img, hw in out:
        if p == bad:
            assert img is None
            continue
        ref, ref_hw = pad_to_bucket(load_image_gray(p))
        assert hw == ref_hw
        assert img.shape == ref.shape
        assert np.array_equal(img, ref)
