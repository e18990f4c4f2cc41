"""Deterministic synthetic test images for golden-file tests.

The reference detector (/root/reference/hesaff.cpp:133-180) consumes 8-bit
3-channel images via cv::imread and converts to gray as (B+G+R)/3. We generate
P6 PPM images (which imread decodes losslessly) with rich blob/corner/texture
structure so the Hessian-Affine detector finds several hundred keypoints.
"""

import numpy as np


def synth_image(width: int, height: int, seed: int = 0) -> np.ndarray:
    """Return (H, W, 3) uint8 RGB image with blobs, edges and texture."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:height, 0:width].astype(np.float64)

    img = 40.0 + 60.0 * (x / width) + 30.0 * (y / height)

    # Gaussian blobs of varying scale and polarity (DoH bright/dark/saddle mix)
    n_blobs = max(40, (width * height) // 900)
    for _ in range(n_blobs):
        cx = rng.uniform(0.03, 0.97) * width
        cy = rng.uniform(0.03, 0.97) * height
        # mostly small blobs (first octaves), a few large ones
        if rng.rand() < 0.85:
            s = rng.uniform(1.2, 6.0)
        else:
            s = rng.uniform(6.0, min(width, height) / 8.0)
        amp = rng.uniform(-130, 130)
        # anisotropic orientation
        th = rng.uniform(0, np.pi)
        ax = rng.uniform(0.4, 2.5)
        dx = (x - cx) * np.cos(th) + (y - cy) * np.sin(th)
        dy = -(x - cx) * np.sin(th) + (y - cy) * np.cos(th)
        img += amp * np.exp(-(dx**2 * ax + dy**2 / ax) / (2 * s * s))

    # Rectangles / corners
    for _ in range(max(10, n_blobs // 3)):
        x0 = int(rng.uniform(0, width * 0.85))
        y0 = int(rng.uniform(0, height * 0.85))
        w = int(rng.uniform(3, width * 0.12))
        h = int(rng.uniform(3, height * 0.12))
        img[y0:y0 + h, x0:x0 + w] += rng.uniform(-70, 70)

    # Texture noise
    img += rng.randn(height, width) * 5.0

    img = np.clip(img, 0, 255)
    base = img.astype(np.uint8)
    # channels differ slightly to exercise the (B+G+R)/3 gray conversion
    r = np.clip(img + 6.0 * np.sin(x / 17.0), 0, 255).astype(np.uint8)
    g = base
    b = np.clip(img - 5.0 * np.cos(y / 23.0), 0, 255).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def write_ppm(path: str, rgb: np.ndarray) -> None:
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(rgb.tobytes())


GOLDEN_IMAGES = {
    # name: (width, height, seed)
    "synth_256x200": (256, 200, 7),
    "synth_200x160": (200, 160, 3),
    "synth_640x480": (640, 480, 11),
}


def main(outdir: str) -> None:
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, (w, h, seed) in GOLDEN_IMAGES.items():
        write_ppm(os.path.join(outdir, name + ".ppm"), synth_image(w, h, seed))
        print("wrote", name)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/golden_work")
