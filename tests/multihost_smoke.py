"""Two-process jax.distributed smoke worker (SURVEY.md §4 item 4).

Run by test_dist.test_two_process_multihost as two subprocesses on the
CPU backend with a localhost coordinator — the same
`jax.distributed.initialize` + NamedSharding/shard_map programs a TPU
pod would use (dist.init_multihost), exercised across real process
boundaries: sharded extraction over a 2-process mesh and ring-kNN
matching with ppermute crossing the process boundary.

Usage: multihost_smoke.py <process_id> <num_processes> <port> <outdir>
Each process writes <outdir>/ok_<pid>.json on success.
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    # one CPU device per process BEFORE backend init
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from hesaff_tpu.dist import init_multihost

    init_multihost(coordinator=f"localhost:{port}",
                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc          # global device view
    assert len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.dist import default_bucket_spec, extraction_step
    from hesaff_tpu.match import knn2, ring_knn2

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # ---- sharded extraction: each process owns one image ----
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "golden"))
    import gen_images

    H, W = 160, 128
    imgs = np.stack([
        gen_images.synth_image(W, H, seed=s).astype(np.float32).mean(-1)
        for s in range(nproc)
    ])
    cfg = HesaffConfig()
    # shard_map (not GSPMD auto-partitioning): each process extracts
    # its own image shard LOCALLY and the only cross-process collective
    # is one explicit psum of the descriptor counts.  The GSPMD form
    # (jit(extraction_step, in_shardings=...)) let the partitioner
    # insert many dataflow-INDEPENDENT all-gathers, which XLA:CPU
    # executes concurrently — two ranks can interleave them in
    # different orders on the shared Gloo pair, tripping Gloo's
    # sequential payload matching (SIGABRT; raced since round 2,
    # surfaced with round-4 host timing).  shard_map with
    # dataflow-chained collectives is also the deployment design
    # (SURVEY.md §2.2): per-host work stays local, collectives are
    # explicit and ordered.
    buckets = default_bucket_spec(H, W, cfg, per_image_cap=512, batch=1)
    sh = NamedSharding(mesh, P("data", None, None))
    local = jax.device_put(imgs[pid][None], jax.local_devices()[0])
    garr = jax.make_array_from_single_device_arrays(
        (nproc, H, W), sh, [local])

    def local_step(im):
        feats = extraction_step(im, cfg, buckets)
        n = jnp.sum(feats.valid.astype(jnp.int32))
        # scalar overflow -> (1,) so every output has a shardable axis
        feats = feats._replace(overflow=feats.overflow[None])
        return feats, jax.lax.psum(n, "data")

    step = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P("data", None, None),
        out_specs=(P("data"), P()), check_vma=False,
    ))
    feats, n_total = step(garr)
    jax.block_until_ready(feats)
    n_desc = int(np.asarray(n_total))
    n_local = int(np.asarray(
        feats.valid.addressable_shards[0].data
        if hasattr(feats.valid, "addressable_shards") else feats.valid
    ).sum())
    assert n_desc > 0, "no keypoints detected across the pod"
    assert 0 < n_local < n_desc, "psum did not span processes"

    # ---- ring kNN across the process boundary ----
    rng = np.random.default_rng(0)
    Q, M, D = 64, 64, 128
    q_all = rng.standard_normal((nproc * Q, D)).astype(np.float32)
    db_all = rng.standard_normal((nproc * M, D)).astype(np.float32)
    psh = NamedSharding(mesh, P("data", None))
    mk = lambda a, n: jax.make_array_from_single_device_arrays(
        (nproc * n, D), psh,
        [jax.device_put(a[pid * n:(pid + 1) * n], jax.local_devices()[0])])
    qg = mk(q_all, Q)
    dbg = mk(db_all, M)
    ring = jax.jit(jax.shard_map(
        lambda q, db: ring_knn2(q, db, "data"),
        mesh=mesh, in_specs=(P("data", None), P("data", None)),
        out_specs=P("data"), check_vma=False,
    ))
    out = ring(qg, dbg)
    # compare this process's shard against the local dense answer
    dense = knn2(jnp.asarray(q_all), jnp.asarray(db_all))
    got_idx = np.asarray(
        out.idx.addressable_shards[0].data
        if hasattr(out.idx, "addressable_shards") else out.idx)
    want_idx = np.asarray(dense.idx)[pid * Q:(pid + 1) * Q]
    assert np.array_equal(got_idx.reshape(-1), want_idx.reshape(-1)), \
        "ring kNN disagrees with dense kNN across processes"

    with open(os.path.join(outdir, f"ok_{pid}.json"), "w") as f:
        json.dump({"n_desc": n_desc, "pid": pid}, f)
    print(f"process {pid}: ok (n_desc={n_desc})")


if __name__ == "__main__":
    main()
