"""Benchmark: batched Hessian-Affine + SIFT extraction throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference C++ binary measured in this container on the
IDENTICAL bench imagery (gen_images.synth_image 800x640, seeds 0-15,
fed as 8-bit PNGs): 27,835 descriptors in a best-of-3 sweep of 5.014 s
self-reported detect time = 5,551 desc/s single CPU thread
(BASELINE.md bench-imagery pin, 2026-08-20).  Detect-time-only is the
most-generous-to-reference scope and matches this bench's
device-resident compute-only scope.  vs_baseline = desc/s / 5551.4.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_DESC_PER_S = 5551.4


def _stage_breakdown(images, cfg, groups, iters=3):
    """Sync-timed per-stage attribution of one grouped extraction batch.

    Forces a tiny host transfer after each stage (block_until_ready does
    not reliably block through the axon tunnel), so the sum exceeds the
    pipelined headline time — this is for attribution, not the metric.
    """
    import time

    import jax
    import numpy as np

    from hesaff_tpu.dist import (
        _PALLAS_GROUP_MAX,
        _direct_branch_stage,
        _group_select_stage,
        _phase_a_flat,
        _sift_masked_stage,
        _tail_select_stage,
        tail_source_level,
        tail_source_plan,
    )
    from hesaff_tpu.patches import _min_workspace

    import jax.numpy as jnp

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.reshape(-1)[:1])
        return x

    def t(name, fn):
        sync(fn())
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"# stage {name:24s} {best * 1000:8.1f} ms",
              file=sys.stderr)
        return fn()

    flat, levels = t("phase_a",
                     lambda: _phase_a_flat(images, cfg))
    ncap = flat["x"].shape[0] // images.shape[0]
    mixed = (_min_workspace(cfg)
             <= cfg.oversample_cutoff * cfg.patch_size + 2)
    Ho, Wo = images.shape[-2], images.shape[-1]
    base_pd = 0.5 if cfg.upscale_input else 1.0
    lvl_cache = {}
    prev = 0
    pieces = []
    for bsize, bcap in groups:
        if bsize <= _PALLAS_GROUP_MAX:
            r = t(f"group_{bsize}_cap{bcap}",
                  lambda b=bsize, c=bcap, p=prev: _group_select_stage(
                      images, flat, cfg, b, c, p, ncap, mixed))
        else:
            ps, octave, bucket_src = tail_source_plan(bsize, base_pd)
            src = tail_source_level(images, cfg, octave, levels,
                                    lvl_cache)
            r = t(f"tail_{bsize}_cap{bcap}",
                  lambda b=bsize, c=bcap, p=prev, s=src, pp=ps,
                         bs=bucket_src: _tail_select_stage(
                      s, flat, cfg, b, c, p, ncap, pp, bs, (Ho, Wo)))
        pieces.append(r)
        prev = bsize
    if mixed:
        dcap = max(64, groups[0][1] // 4)
        pieces.append(t("direct",
                        lambda: _direct_branch_stage(images, flat, cfg,
                                                     dcap, ncap)))
    import jax.numpy as jnp
    patches = jnp.concatenate([p[0] for p in pieces])
    pvalid = jnp.concatenate([p[1] for p in pieces])
    t("sift", lambda: _sift_masked_stage(patches, pvalid, cfg))


def _verify_on_chip(images, cfg, out, args) -> None:
    """On-chip numeric parity gate: the fused-Pallas grouped result must
    match the all-XLA twin pipeline ON THE SAME HARDWARE, at the same
    tolerances the interpret-mode tests use (U within 0.02, descriptors
    within +-2 quantization steps).  A silently mis-lowered Mosaic
    kernel (the failure class that struck twice in rounds 2-3: scf.yield
    vector<i1>, atan2) fails here and the bench refuses to print a
    headline.  Exits nonzero on failure.
    """
    import dataclasses

    import jax
    import numpy as np

    from hesaff_tpu.dist import default_bucket_spec, extraction_step_staged

    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    buckets = default_bucket_spec(args.height, args.width, cfg_x,
                                  per_image_cap=args.cap,
                                  batch=images.shape[0])
    ref = extraction_step_staged(images, cfg_x, buckets)
    jax.block_until_ready(ref)

    pv = np.asarray(out.valid)
    rv = np.asarray(ref.valid)
    problems = []
    n_p, n_r = int(pv.sum()), int(rv.sum())
    if abs(n_p - n_r) > 0.01 * max(n_r, 1):
        problems.append(f"count mismatch: pallas={n_p} xla={n_r}")
    # match by image + quantized geometry (identical algorithms modulo
    # kernel precision: positions agree to ~1e-3 px)
    def keyed(o, v):
        img = np.asarray(o.img_idx)[v] if hasattr(o, "img_idx") else \
            np.zeros(v.sum(), np.int32)
        return {
            (int(im), round(float(x), 2), round(float(y), 2),
             round(float(s), 2)): i
            for i, (im, x, y, s) in enumerate(zip(
                img, np.asarray(o.x)[v], np.asarray(o.y)[v],
                np.asarray(o.s)[v]))
        }

    kp = keyed(out, pv)
    kr = keyed(ref, rv)
    common = set(kp) & set(kr)
    if len(common) < 0.99 * max(n_r, 1):
        problems.append(
            f"geometry match {len(common)}/{n_r} below 99%")
    if common:
        ip = np.asarray([kp[k] for k in common])
        ir = np.asarray([kr[k] for k in common])
        # a handful of threshold-adjacent keypoints legitimately flip
        # convergence iteration between the bf16x3 Pallas path and the
        # HIGHEST XLA path (documented in pallas_affine's module doc);
        # their U and descriptors then differ materially.  The gate is
        # therefore distributional: the BULK must be tight (p99.5) and
        # outliers must stay rare — a mis-lowered kernel shifts the
        # whole distribution and still fails loudly.
        p995_max = 0.0
        for f in ("a11", "a12", "a21", "a22"):
            dp = np.asarray(getattr(out, f))[pv][ip]
            dr = np.asarray(getattr(ref, f))[rv][ir]
            d = np.abs(dp - dr)
            p995 = float(np.quantile(d, 0.995))
            p995_max = max(p995_max, p995)
            frac_loose = float((d > 0.02).mean())
            if p995 > 0.02 or frac_loose > 0.002:
                problems.append(
                    f"{f} diverges: p99.5={p995:.4f} "
                    f"frac>|0.02|={frac_loose:.4f}")
        dp = np.asarray(out.desc)[pv][ip].astype(np.int32)
        dr = np.asarray(ref.desc)[rv][ir].astype(np.int32)
        dkp = np.abs(dp - dr).max(axis=1)          # per-keypoint max
        dmean = float(np.abs(dp - dr).mean())
        frac_div = float((dkp > 2).mean())
        # measured healthy state: frac_div ~0.005 (threshold-flip
        # keypoints); a mis-lowered kernel pushes this to ~1.0
        if dmean > 0.05 or frac_div > 0.012:
            problems.append(
                f"descriptors diverge: mean L1={dmean:.4f} "
                f"frac kp max>2 = {frac_div:.4f}")
        print(f"# verify: matched {len(common)}/{n_r}, desc mean L1="
              f"{dmean:.4f}, kp max>2 frac={frac_div:.4f}, "
              f"U p99.5={p995_max:.4f}", file=sys.stderr)
    if problems:
        for p in problems:
            print(f"# VERIFY FAILED: {p}", file=sys.stderr)
        sys.exit(1)
    print("# verify: on-chip Pallas/XLA parity OK", file=sys.stderr)


def _wait_for_backend(max_wait_s: float = 1500.0) -> None:
    """Block until the TPU backend answers a tiny probe, bounded.

    The axon tunnel's lease can wedge for minutes after an aborted
    client; in-process backend init then hangs uninterruptibly.  Probe
    in a subprocess with a LONG timeout (a killed short probe orphans
    its grant and renews the wedge), and only init in-process once a
    probe has succeeded.  Gives up (and lets the real init try anyway)
    after max_wait_s.
    """
    import subprocess

    probe = ("import jax; jax.devices(); import jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 128)))))")
    deadline = time.perf_counter() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.perf_counter()
        if budget <= 0:
            print(f"# backend probe gave up after {attempt - 1} attempts",
                  file=sys.stderr)
            return
        try:
            subprocess.run(
                [sys.executable, "-c", probe],
                timeout=min(600.0, max(60.0, budget)),
                check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print(f"# backend probe {attempt} failed; retrying",
                  file=sys.stderr)
            time.sleep(min(60.0, max(0.0, deadline - time.perf_counter())))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--cap", type=int, default=1024,
                    help="per-image keypoint capacity for bucket sizing")
    ap.add_argument("--cand-div", type=int, default=128,
                    help="candidate_cap_div (bigger = tighter per-level "
                         "walk capacities; overflow is reported, tune "
                         "until 0)")
    ap.add_argument("--affine-div", type=int, default=256,
                    help="affine_cap_div (bigger = tighter per-octave "
                         "affine capacities)")
    ap.add_argument("--stages", action="store_true",
                    help="print a sync-timed per-stage breakdown first "
                         "(adds tunnel latency; headline numbers stay "
                         "pipelined)")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the on-chip Pallas-vs-XLA parity gate "
                         "(default: a parity failure aborts before the "
                         "headline prints)")
    ap.add_argument("--fast", action="store_true",
                    help="FAST MODE (non-default config.FAST_CONFIG): "
                         "looser Baumberg convergence + tighter "
                         "iteration cap; accuracy delta in OXFORD.md. "
                         "Emits a distinct metric name and skips the "
                         "parity verify (fast mode is not the parity "
                         "contract)")
    ap.add_argument("--probe-compute", action="store_true",
                    help="DIAGNOSTIC: drain batches with "
                         "block_until_ready only (no descriptor "
                         "download) to separate device compute from "
                         "tunnel transfer; not the headline metric")
    args = ap.parse_args()

    if not args.cpu:
        _wait_for_backend()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests", "golden"))
    import gen_images

    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.dist import (
        default_bucket_spec,
        default_group_spec,
        extraction_step_grouped,
        extraction_step_staged,
    )

    on_tpu = not args.cpu and jax.default_backend() == "tpu"
    # capacities sized so nothing overflows on the (keypoint-dense)
    # synthetic bench imagery — a defensible number processes every
    # keypoint the reference would
    import dataclasses as _dc

    from hesaff_tpu.config import FAST_CONFIG
    base = FAST_CONFIG if args.fast else HesaffConfig()
    cfg = _dc.replace(
        base,
        candidate_cap_max=8192,
        affine_cap_max=8192,
        candidate_cap_div=args.cand_div,
        affine_cap_div=args.affine_div,
    )
    rng_imgs = [
        gen_images.synth_image(args.width, args.height, seed=s)
        .astype(np.float32).mean(axis=-1)
        for s in range(args.batch)
    ]
    images = jnp.asarray(np.stack(rng_imgs))

    if on_tpu:
        groups = default_group_spec(args.height, args.width, cfg,
                                    per_image_cap=args.cap,
                                    batch=args.batch)
        step = lambda im: extraction_step_grouped(im, cfg, groups)
    else:
        buckets = default_bucket_spec(args.height, args.width, cfg,
                                      per_image_cap=args.cap,
                                      batch=args.batch)
        step = lambda im: extraction_step_staged(im, cfg, buckets)

    t0 = time.perf_counter()
    try:
        out = step(images)
        jax.block_until_ready(out)
    except Exception as e:
        # fail-safe: a Pallas/Mosaic compile regression on the driver's
        # toolchain must degrade to the XLA twin, never kill the bench
        print(f"# grouped path failed ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}); falling back to the "
              f"staged XLA path", file=sys.stderr)
        buckets = default_bucket_spec(args.height, args.width, cfg,
                                      per_image_cap=args.cap,
                                      batch=args.batch)
        step = lambda im: extraction_step_staged(im, cfg, buckets)
        out = step(images)
        jax.block_until_ready(out)
        on_tpu = False   # staged output is NOT valid-prefix compacted
    t_compile = time.perf_counter() - t0

    if on_tpu and not args.no_verify and not args.fast:
        _verify_on_chip(images, cfg, out, args)

    if args.stages and on_tpu:
        _stage_breakdown(images, cfg, groups)

    n_desc = int(np.asarray(out.valid).sum())
    overflow = int(np.asarray(out.overflow))
    # steady-state pipelined throughput: keep two batches in flight so
    # the result download (slow tunnel link) overlaps the next batch's
    # compute — the serving architecture a fleet would use
    # drain = ONE full descriptor transfer: the tunnel is LATENCY-
    # dominated (~110 ms/round-trip measured), so splitting the
    # download into per-block valid prefixes (8 small transfers,
    # 1.374 s/batch) or gathering a dense prefix on device (XLA row
    # gather, +150 ms) both LOST to the single 5 MB transfer; see
    # PERF.md round-4 transport analysis
    def drain(o):
        if not args.probe_compute:
            np.asarray(o.desc)
        jax.block_until_ready(o)

    outs = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        outs.append(step(images))
        while len(outs) > 2:
            drain(outs.pop(0))
    for o in outs:
        drain(o)
    t = (time.perf_counter() - t0) / args.iters
    desc_per_s = n_desc / t
    img_per_s = args.batch / t

    print(
        f"# batch={args.batch} {args.width}x{args.height} "
        f"desc={n_desc} compile={t_compile:.1f}s "
        f"best={t:.3f}s img/s={img_per_s:.1f} overflow={overflow} "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    # a --probe-compute number skips the descriptor download and must
    # not be mistaken for a genuine headline by JSON consumers
    metric = "hesaff_sift_descriptors_per_sec_per_chip"
    if args.fast:
        metric += "_fast_mode"
    if args.probe_compute:
        metric += "_compute_probe"
    print(json.dumps({
        "metric": metric,
        "value": round(desc_per_s, 1),
        "unit": "desc/s",
        "vs_baseline": round(desc_per_s / BASELINE_DESC_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
