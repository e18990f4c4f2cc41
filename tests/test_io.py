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


def test_native_png_decodes_16bit(tmp_path):
    """16-bit PNG now decodes natively (strip-16 high byte, the
    cv::imread semantics); load_image_gray agrees either way."""
    arr16 = np.full((8, 8), 1000, np.uint16)
    path = str(tmp_path / "img16.png")
    PIL.fromarray(arr16).save(path)
    with open(path, "rb") as f:
        dec = native.decode_png_gray(f.read())
    if dec is not None:
        np.testing.assert_array_equal(
            dec, (arr16 >> 8).astype(np.float32))
    out = load_image_gray(path)
    assert out.shape == (8, 8)


@pytest.mark.parametrize("mode,sub,q,prog", [
    ("RGB", 0, 95, False),   # 4:4:4 baseline
    ("RGB", 1, 75, False),   # 4:2:2
    ("RGB", 2, 85, False),   # 4:2:0
    ("L", 0, 90, False),     # grayscale
    ("RGB", 0, 90, True),    # progressive 4:4:4
    ("RGB", 2, 75, True),    # progressive 4:2:0
    ("L", 0, 85, True),      # progressive grayscale
])
def test_native_jpeg_matches_pil(tmp_path, mode, sub, q, prog):
    """Native baseline JPEG decoder vs PIL/libjpeg: equal-weight gray
    within ~2 LSB (float IDCT + triangular chroma upsampling vs
    libjpeg's fixed-point pipeline; JPEG does not specify a bit-exact
    decoder).  Reference context: cv::imread at hesaff.cpp:137."""
    rng = np.random.RandomState(11)
    a = rng.normal(128, 50, (61, 97, 3)).astype(np.float32)
    for _ in range(6):
        for ax in (0, 1):
            a = (a + np.roll(a, 1, ax)) * 0.5
    a = np.clip(a, 0, 255).astype(np.uint8)
    im = PIL.fromarray(a if mode == "RGB" else a[..., 0], mode)
    path = str(tmp_path / f"img_{mode}_{sub}.jpg")
    kw = {"quality": q, "progressive": prog}
    if mode == "RGB":
        kw["subsampling"] = sub
    im.save(path, "JPEG", **kw)
    with open(path, "rb") as f:
        nat = native.decode_jpeg_gray(f.read())
    assert nat is not None, "native JPEG decoder did not engage"
    ref = np.asarray(PIL.open(path).convert("RGB"), np.float32).mean(-1)
    assert nat.shape == ref.shape
    d = np.abs(nat - ref)
    assert d.max() <= 2.5 and d.mean() < 0.5, (d.max(), d.mean())
    np.testing.assert_array_equal(load_image_gray(path), nat)


def test_native_jpeg_restart_markers(tmp_path):
    """Restart markers decode in both baseline and progressive files."""
    rng = np.random.RandomState(12)
    a = np.clip(rng.normal(128, 40, (64, 80, 3)), 0, 255).astype(np.uint8)
    im = PIL.fromarray(a)
    for name, kw in (("rst.jpg", {"restart_marker_blocks": 2}),
                     ("rstp.jpg", {"restart_marker_blocks": 2,
                                   "progressive": True})):
        p1 = str(tmp_path / name)
        im.save(p1, "JPEG", quality=80, **kw)
        with open(p1, "rb") as f:
            nat = native.decode_jpeg_gray(f.read())
        assert nat is not None, name
        ref = np.asarray(PIL.open(p1).convert("RGB"),
                         np.float32).mean(-1)
        assert np.abs(nat - ref).mean() < 0.5, name


def test_prefetch_loader_decodes_jpeg(tmp_path):
    """The native prefetch loader decodes JPEG in its worker threads."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    from hesaff_tpu.utils.fleet import pad_to_bucket

    rng = np.random.RandomState(13)
    a = np.clip(rng.normal(128, 40, (70, 90, 3)), 0, 255).astype(np.uint8)
    p = str(tmp_path / "im.jpg")
    PIL.fromarray(a).save(p, "JPEG", quality=90)
    with native.PrefetchLoader([p], threads=1) as loader:
        out = list(loader)
    assert len(out) == 1 and out[0][1] is not None
    ref, ref_hw = pad_to_bucket(load_image_gray(p))
    assert out[0][2] == ref_hw
    assert np.array_equal(out[0][1], ref)


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


def test_native_png_16bit():
    """16-bit PNGs decode natively with cv::imread's strip-16 semantics
    (high byte), for gray and hand-crafted RGB; 8-bit path unchanged."""
    import io
    import struct
    import zlib

    from PIL import Image

    from hesaff_tpu import native

    rng = np.random.default_rng(3)
    img16 = rng.integers(0, 65536, (33, 47), np.uint16)
    buf = io.BytesIO()
    Image.fromarray(img16.astype(np.int32), mode="I").convert(
        "I;16").save(buf, format="PNG")
    out = native.decode_png_gray(buf.getvalue())
    if out is None:
        import pytest
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(out, (img16 >> 8).astype(np.float32))

    # hand-crafted 16-bit RGB PNG (PIL cannot write RGB;16)
    h, w = 9, 11
    rgb = rng.integers(0, 65536, (h, w, 3), np.uint16)
    raw = b"".join(
        b"\x00" + rgb[r].astype(">u2").tobytes() for r in range(h))
    def chunk(typ, payload):
        c = struct.pack(">I", len(payload)) + typ + payload
        return c + struct.pack(">I", zlib.crc32(typ + payload))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    out = native.decode_png_gray(png)
    assert out is not None
    hi = (rgb >> 8).astype(np.float32)
    expect = (hi[..., 0] + hi[..., 1] + hi[..., 2]) / 3.0
    np.testing.assert_allclose(out, expect, atol=1e-4)
