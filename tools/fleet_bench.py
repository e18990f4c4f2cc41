"""Fleet end-to-end benchmark: decode -> extract -> export img/s.

This is the number a user gets from `hesaff_tpu.cli fleet`: a mixed-size
PNG corpus on disk, the native prefetch loader (C++ decode + pad thread
pool) feeding the checkpointed extraction loop, features written as npz.
Reports img/s, desc/s, and the loader-overlap efficiency (wall vs the
sum of pure-decode and pure-extract time).

Usage: python tools/fleet_bench.py [--n 64] [--batch 8] [--cpu]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests", "golden"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the corpus/output dirs (debug)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import gen_images
    from PIL import Image

    from hesaff_tpu.utils.fleet import extract_fleet, pad_to_bucket

    # mixed-size corpus: two shape buckets (even split), written as
    # PNGs.  Paths are ordered shape-major (all of one size first) —
    # the scheduling a real fleet uses so extraction chunks stay
    # shape-homogeneous and each bucket compiles once at full batch.
    sizes = [(800, 640), (640, 512)]
    tmp = tempfile.mkdtemp(prefix="fleet_bench_")
    corpus = os.path.join(tmp, "corpus")
    outdir = os.path.join(tmp, "out")
    os.makedirs(corpus)
    paths = []
    t0 = time.perf_counter()
    for i in range(args.n):
        w, h = sizes[i * len(sizes) // args.n]
        img = (gen_images.synth_image(w, h, seed=i)
               .astype(np.float32).mean(axis=-1))
        p = os.path.join(corpus, f"img_{i:04d}.png")
        Image.fromarray(np.clip(np.round(img), 0, 255)
                        .astype(np.uint8)).save(p)
        paths.append(p)
    t_gen = time.perf_counter() - t0

    # pure-decode time (native loader, no device work)
    from hesaff_tpu import native

    t0 = time.perf_counter()
    n_dec = 0
    if native.available():
        for _, img, hw in native.PrefetchLoader(paths):
            n_dec += 1
    t_decode = time.perf_counter() - t0

    # warm-up batch per shape bucket so the fleet loop measures steady
    # state, not compile (compile cost is reported separately) — warms
    # the SAME path the fleet routes through (_extract_chunk: grouped
    # fused-Pallas on TPU, staged on CPU)
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.utils.fleet import _extract_chunk

    cfg = HesaffConfig()
    t0 = time.perf_counter()
    for w, h in sizes:
        img = (gen_images.synth_image(w, h, seed=0)
               .astype(np.float32).mean(axis=-1))
        pad, hw = pad_to_bucket(img)
        batch = np.broadcast_to(pad, (args.batch,) + pad.shape).copy()
        feats = _extract_chunk(
            batch, np.asarray([hw] * args.batch, np.int32), cfg)
        np.asarray(feats[0].x)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    cursor = extract_fleet(paths, outdir, cfg=cfg,
                           batch_size=args.batch,
                           log=lambda m: None, prefetch=True)
    t_fleet = time.perf_counter() - t0

    n_done = len(cursor["done"])
    n_desc = 0
    for p in cursor["done"]:
        base = os.path.splitext(os.path.basename(p))[0]
        with np.load(os.path.join(outdir, base + ".npz")) as d:
            n_desc += len(d["x"])

    if not args.keep:
        shutil.rmtree(tmp)

    print(json.dumps({
        "metric": "fleet_end_to_end",
        "images": n_done,
        "failed": len(cursor["failed"]),
        "descriptors": n_desc,
        "img_per_s": round(n_done / t_fleet, 2),
        "desc_per_s": round(n_desc / t_fleet, 1),
        "fleet_wall_s": round(t_fleet, 2),
        "pure_decode_s": round(t_decode, 2),
        "decode_overlap_pct": round(
            100.0 * min(1.0, t_decode / max(t_fleet, 1e-9)), 1),
        "compile_s": round(t_compile, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
