"""Per-stage TPU profiling of the staged extraction pipeline.

Times each jitted stage with forced syncs (block_until_ready after each
stage, warm cache) to attribute the batch wall-clock.  Not a bench —
per-stage syncs add tunnel latency; use bench.py for the headline.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden"))


def sync(x):
    import jax
    jax.block_until_ready(x)
    # force a tiny real transfer: async dispatch can lie through the tunnel
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import gen_images
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.dist import (
        _bucket_select_stage, _describe_stage, _phase_a_flat,
        default_bucket_spec,
    )

    cfg = HesaffConfig()
    imgs = [
        gen_images.synth_image(args.width, args.height, seed=s)
        .astype(np.float32).mean(axis=-1)
        for s in range(args.batch)
    ]
    images = jnp.asarray(np.stack(imgs))
    buckets = default_bucket_spec(args.height, args.width, cfg,
                                  per_image_cap=args.cap, batch=args.batch)
    print(f"buckets: {buckets}", file=sys.stderr)

    def run_once(report=False):
        t = {}
        t0 = time.perf_counter()
        flat, _ = _phase_a_flat(images, cfg)
        flat = sync(flat)
        t["phaseA(detect+affine)"] = time.perf_counter() - t0
        ncap = flat["x"].shape[0] // images.shape[0]
        pieces = []
        prev = 0
        for bsize, bcap in buckets:
            t0 = time.perf_counter()
            pk, pok, gi, sel, over = sync(_bucket_select_stage(
                images, flat, cfg, bsize, bcap, prev, ncap))
            t[f"bucket{bsize}(cap{bcap})"] = time.perf_counter() - t0
            if report:
                nv = int(np.asarray(pok).sum())
                print(f"  bucket {bsize}: {nv} valid / cap {bcap}",
                      file=sys.stderr)
            pieces.append((pk, pok))
            prev = bsize
        t0 = time.perf_counter()
        patches = jnp.concatenate([p[0] for p in pieces])
        descs = sync(_describe_stage(patches, cfg))
        t["sift"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        d = np.asarray(descs)
        t["download"] = time.perf_counter() - t0
        nvalid = int(np.concatenate(
            [np.asarray(p[1]) for p in pieces]).sum())
        return t, nvalid

    # warmup / compile
    t0 = time.perf_counter()
    _, nvalid = run_once(report=True)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s  "
          f"n_desc={nvalid}", file=sys.stderr)

    best = None
    for _ in range(args.iters):
        t, _ = run_once()
        if best is None or sum(t.values()) < sum(best.values()):
            best = t
    total = sum(best.values())
    print(f"\n== stage timings (best of {args.iters}, per-stage sync) ==")
    for k, v in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v*1e3:8.1f} ms  {100*v/total:5.1f}%")
    print(f"  {'TOTAL':28s} {total*1e3:8.1f} ms   "
          f"({nvalid/total:.0f} desc/s)")


if __name__ == "__main__":
    main()
