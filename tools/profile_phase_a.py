"""Attribute phase A's on-chip time: pyramid vs detect vs affine.

Compiles three truncated variants of batch.detect_affine_batch's loop
(pyramid only / pyramid+detect / full) and diffs their sync-timed
wall-clocks.  Each variant returns (and therefore materializes) the
stage outputs, so XLA cannot dead-code the work under test.  Adds
tunnel sync latency per run — use for attribution, not headlines.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cand-div", type=int, default=128)
    ap.add_argument("--affine-div", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import gen_images
    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.detect import detect_octave_batch
    from hesaff_tpu.pyramid import (build_octave, level_sigmas,
                                    prepare_first_level)

    cfg = HesaffConfig(candidate_cap_max=8192, affine_cap_max=8192,
                       candidate_cap_div=args.cand_div,
                       affine_cap_div=args.affine_div)
    imgs = [
        gen_images.synth_image(args.width, args.height, seed=s)
        .astype(np.float32).mean(axis=-1)
        for s in range(args.batch)
    ]
    images = jnp.asarray(np.stack(imgs))
    sig = level_sigmas(cfg)

    def octave_shapes():
        h, w = args.height, args.width
        out = []
        while h > cfg.min_octave_size and w > cfg.min_octave_size:
            out.append((h, w))
            h //= 2
            w //= 2
        return out

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run(images, stage: str):
        from hesaff_tpu.affine_shape import adapt_flat

        B = images.shape[0]
        cur = jax.vmap(lambda im: prepare_first_level(im, cfg)[0])(images)
        pd = 0.5 if cfg.upscale_input else 1.0
        outs = []
        octave = 0
        while (cur.shape[-2] > cfg.min_octave_size
               and cur.shape[-1] > cfg.min_octave_size):
            H, W = cur.shape[-2], cur.shape[-1]

            def oct_fn(f):
                o = build_octave(f, pd, cfg)
                return o.blurs, o.resps, o.next_first
            blurs, resps, nxt = jax.vmap(oct_fn)(cur)
            if stage == "pyramid":
                # consume: checksum forces materialization of the stacks
                outs.append(jnp.sum(blurs) + jnp.sum(resps))
            else:
                comp = detect_octave_batch(resps, blurs, sig, pd, cfg,
                                           octave=octave)
                if stage == "detect":
                    outs.append(sum(jnp.sum(v) for v in
                                    (comp["x"], comp["y"], comp["s"])))
                else:
                    cap = comp["ok"].shape[1]
                    flat = {k: v.reshape(-1) for k, v in comp.items()
                            if k not in ("overflow", "n_cand")}
                    img_idx = jnp.repeat(
                        jnp.arange(B, dtype=jnp.int32), cap)
                    safe = lambda a, d: jnp.where(flat["ok"], a, d)
                    ar = adapt_flat(
                        blurs[:, :cfg.num_scales], img_idx,
                        flat["level"] - 1,
                        safe(flat["x"], (W // 2) * pd),
                        safe(flat["y"], (H // 2) * pd),
                        safe(flat["s"], 2.0 * pd), pd, cfg,
                        active=flat["ok"])
                    outs.append(jnp.sum(ar.u11) + jnp.sum(ar.u22)
                                + jnp.sum(ar.iters))
            cur = nxt
            pd *= 2.0
            octave += 1
        return sum(outs)

    def sync_time(stage):
        r = run(images, stage)
        np.asarray(r)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(run(images, stage))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"octaves: {octave_shapes()}", file=sys.stderr)
    t_pyr = sync_time("pyramid")
    t_det = sync_time("detect")
    t_aff = sync_time("affine")
    print(f"pyramid-only        {t_pyr*1e3:8.1f} ms")
    print(f"pyramid+detect      {t_det*1e3:8.1f} ms   "
          f"(detect ~{(t_det-t_pyr)*1e3:.1f} ms)")
    print(f"pyramid+det+affine  {t_aff*1e3:8.1f} ms   "
          f"(affine ~{(t_aff-t_det)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
