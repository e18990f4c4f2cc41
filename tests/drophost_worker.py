"""Drop-host fault-injection worker (SURVEY.md §5: "fault injection =
drop-host test in the matching/BA collectives path").

A multi-round sharded ring-kNN job where one host dies mid-run:

  * every round starts with utils.fleet.host_barrier — the liveness
    gate that turns a dead peer into HostDropError instead of a hung
    collective;
  * each host writes its shard's result per completed round (natural
    checkpoints) plus a cursor of completed rounds;
  * the doomed host (pid == 1) WEDGES at round `die_after` (sleeps
    without reaching the barrier) — the gray failure jax.distributed's
    heartbeat fail-fast does NOT catch (a hard crash is caught by the
    runtime itself, which terminates survivors; either way the
    restart-from-checkpoint protocol below applies);
  * survivors catch HostDropError, persist the cursor, and exit with
    code 17 (the restart signal a fleet controller would act on).

test_dist.test_drop_host_detection_and_restart drives two of these,
then "restarts the job" single-process from the checkpoints and checks
the combined results equal a straight dense run.

Usage: drophost_worker.py <pid> <nproc> <port> <outdir> <rounds> <die_after>
"""

import json
import os
import sys


def round_data(r: int, nproc: int, per: int = 32, dim: int = 16):
    import numpy as np

    rng = np.random.default_rng(1000 + r)
    q = rng.standard_normal((nproc * per, dim)).astype(np.float32)
    db = rng.standard_normal((nproc * per, dim)).astype(np.float32)
    return q, db


def main():
    pid, nproc, port, outdir, rounds, die_after = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        int(sys.argv[5]), int(sys.argv[6]))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hesaff_tpu.dist import init_multihost
    from hesaff_tpu.match import ring_knn2
    from hesaff_tpu.utils.fleet import HostDropError, host_barrier

    init_multihost(coordinator=f"localhost:{port}",
                   num_processes=nproc, process_id=pid)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    psh = NamedSharding(mesh, P("data", None))
    ring = jax.jit(jax.shard_map(
        lambda q, db: ring_knn2(q, db, "data"),
        mesh=mesh, in_specs=(P("data", None), P("data", None)),
        out_specs=P("data"), check_vma=False,
    ))

    per = 32
    cursor = {"completed": 0}
    for r in range(rounds):
        if pid == 1 and r == die_after:
            import time

            time.sleep(1200)   # simulated wedge: alive but no progress

        try:
            host_barrier(f"round{r}", timeout_s=15.0)
        except HostDropError as e:
            cursor["detected_drop_at"] = r
            with open(os.path.join(outdir, f"cursor_{pid}.json"),
                      "w") as f:
                json.dump(cursor, f)
            print(f"process {pid}: {e}; checkpointed at round "
                  f"{cursor['completed']}", flush=True)
            # os._exit: jax.distributed's atexit shutdown barrier would
            # block on the wedged (still-heartbeating) peer
            os._exit(17)

        q, db = round_data(r, nproc, per)
        mk = lambda a: jax.make_array_from_single_device_arrays(
            a.shape, psh,
            [jax.device_put(a[pid * per:(pid + 1) * per],
                            jax.local_devices()[0])])
        out = ring(mk(q), mk(db))
        shard_idx = np.asarray(out.idx.addressable_shards[0].data)
        np.save(os.path.join(outdir, f"round{r}_shard{pid}.npy"),
                shard_idx)
        cursor["completed"] = r + 1
        with open(os.path.join(outdir, f"cursor_{pid}.json"), "w") as f:
            json.dump(cursor, f)
    sys.exit(0)


if __name__ == "__main__":
    main()
