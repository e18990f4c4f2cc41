"""Synthetic Oxford-Affine-style benchmark sequences.

The VGG benchmark images (graf/boat/bikes/wall — the reference's
de-facto validation contract, /root/reference/README:31-44) cannot be
fetched in this environment (no egress), so this module builds
deterministic stand-ins with the same structure: a photographic-texture
base image plus five transformed views and VGG-format homography files
(plain 3x3 text, `H1to{k}p`), one sequence per nuisance family:

  * viewpoint — increasing perspective tilt (graf/wall analogue)
  * zoomrot   — increasing zoom-out + rotation (boat/bark analogue)
  * blur      — increasing Gaussian blur, H = identity (bikes/trees)
  * illum     — decreasing exposure/contrast, H = identity (leuven)
  * jpeg      — decreasing JPEG quality, H = identity (ubc); views are
                re-encoded through a real JPEG codec (PIL) at the
                benchmark's quality ladder, so blocking/ringing
                artifacts are genuine

Every view is synthesized by inverse-warping the base image through the
EXACT homography that is written to disk, so protocol geometry is
noise-free; appearance changes (resampling, blur) are the nuisance.
"""

from __future__ import annotations

import os

import numpy as np


def _bilinear_sample(img: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Bilinear sample img at float coords (replicate borders)."""
    H, W = img.shape[:2]
    x = np.clip(x, 0.0, W - 1.001)
    y = np.clip(y, 0.0, H - 1.001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def warp_image(img: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Inverse-warp: out(p) = img(H^-1 p), same size as img."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)])
    Hinv = np.linalg.inv(H)
    q = Hinv @ pts
    qx = (q[0] / q[2]).reshape(h, w)
    qy = (q[1] / q[2]).reshape(h, w)
    return _bilinear_sample(img, qx, qy)


def gaussian_blur_np(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable sampled-Gaussian blur, replicate borders."""
    if sigma <= 0:
        return img
    k = int(2.0 * 3.0 * sigma + 1.0)
    k += 1 - (k % 2)
    r = k // 2
    t = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    t /= t.sum()
    pad = np.pad(img, ((r, r), (0, 0)) + ((0, 0),) * (img.ndim - 2),
                 mode="edge")
    img = sum(t[i] * pad[i:i + img.shape[0]] for i in range(k))
    pad = np.pad(img, ((0, 0), (r, r)) + ((0, 0),) * (img.ndim - 2),
                 mode="edge")
    return sum(t[i] * pad[:, i:i + img.shape[1]] for i in range(k))


def _center_homography(M: np.ndarray, w: int, h: int) -> np.ndarray:
    """Conjugate M by the move-to-center translation."""
    T = np.array([[1, 0, w / 2.0], [0, 1, h / 2.0], [0, 0, 1.0]])
    Tinv = np.array([[1, 0, -w / 2.0], [0, 1, -h / 2.0], [0, 0, 1.0]])
    return T @ M @ Tinv


def sequence_homographies(kind: str, w: int, h: int):
    """Five homographies of increasing severity (views 2..6)."""
    Hs = []
    for k in range(1, 6):
        if kind == "viewpoint":
            # perspective tilt about the vertical axis + slight rotation
            tilt = np.deg2rad(8.0 * k)
            rot = np.deg2rad(3.0 * k)
            P = np.array([
                [np.cos(tilt), 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [-np.sin(tilt) / (0.9 * w), 0.0, 1.0],
            ])
            R = np.array([
                [np.cos(rot), -np.sin(rot), 0.0],
                [np.sin(rot), np.cos(rot), 0.0],
                [0.0, 0.0, 1.0],
            ])
            M = P @ R
        elif kind == "zoomrot":
            s = 1.0 / (1.0 + 0.12 * k)
            rot = np.deg2rad(10.0 * k)
            M = np.array([
                [s * np.cos(rot), -s * np.sin(rot), 0.0],
                [s * np.sin(rot), s * np.cos(rot), 0.0],
                [0.0, 0.0, 1.0],
            ])
        elif kind in ("blur", "illum", "jpeg"):
            M = np.eye(3)
        else:
            raise ValueError(kind)
        Hs.append(_center_homography(M, w, h))
    return Hs


def write_ppm(path: str, rgb: np.ndarray) -> None:
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.clip(rgb, 0, 255).astype(np.uint8).tobytes())


# leuven-style exposure ladder (view 2..6 luminance scale) and
# ubc-style JPEG quality ladder (the VGG sequence spans ~60%..2%)
ILLUM_SCALES = (0.82, 0.66, 0.53, 0.42, 0.33)
JPEG_QUALITIES = (60, 35, 20, 10, 5)


def jpeg_roundtrip(rgb: np.ndarray, quality: int) -> np.ndarray:
    """Encode/decode through a real JPEG codec at `quality`."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.clip(rgb, 0, 255).astype(np.uint8)).save(
        buf, format="JPEG", quality=int(quality))
    return np.asarray(
        Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
        np.float64)


def build_sequences(outdir: str, width: int = 640, height: int = 480,
                    kinds=("viewpoint", "zoomrot", "blur", "illum",
                           "jpeg"),
                    seed: int = 7):
    """Write <outdir>/<kind>/img{1..6}.ppm + H1to{k}p files.

    Returns {kind: [(img_path, H_path_or_None), ...]}.
    """
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden"))
    import gen_images

    base = gen_images.synth_image(width, height, seed=seed).astype(np.float64)
    out = {}
    for kind in kinds:
        d = os.path.join(outdir, kind)
        os.makedirs(d, exist_ok=True)
        p1 = os.path.join(d, "img1.ppm")
        write_ppm(p1, base)
        seq = [(p1, None)]
        for k, Hk in enumerate(sequence_homographies(kind, width, height),
                               start=2):
            img = warp_image(base, Hk)
            if kind == "blur":
                img = gaussian_blur_np(img, 0.8 * (k - 1))
            elif kind == "illum":
                img = img * ILLUM_SCALES[k - 2]
            elif kind == "jpeg":
                img = jpeg_roundtrip(img, JPEG_QUALITIES[k - 2])
            pk = os.path.join(d, f"img{k}.ppm")
            write_ppm(pk, img)
            hp = os.path.join(d, f"H1to{k}p")
            np.savetxt(hp, Hk, fmt="%.10g")
            seq.append((pk, hp))
        out[kind] = seq
    return out
