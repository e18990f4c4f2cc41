"""Batch + sharded extraction tests on the 8-device CPU mesh."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hesaff_tpu import HesaffConfig, extract
from hesaff_tpu.batch import extract_batch
from hesaff_tpu.dist import (
    default_bucket_spec,
    extraction_step,
    make_mesh,
    sharded_extraction_step,
)

CFG = HesaffConfig()


def _images(n=8, h=96, w=96, seed=3):
    rng = np.random.RandomState(seed)
    imgs = []
    for k in range(n):
        img = rng.rand(h, w) * 40 + 60
        for _ in range(25):
            cx, cy = rng.uniform(8, w - 8), rng.uniform(8, h - 8)
            s = rng.uniform(1.5, 5.0)
            a = rng.uniform(-120, 120)
            y, x = np.mgrid[0:h, 0:w]
            img += a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
        imgs.append(np.clip(img, 0, 255))
    return np.stack(imgs).astype(np.float32)


def test_extract_batch_matches_single(golden_small):
    g1 = golden_small["gray"]
    g2 = g1[::-1, ::-1].copy()
    feats = extract_batch(np.stack([g1, g2]), CFG)
    single = extract(jnp.asarray(g1), CFG)
    f0 = feats[0]
    assert f0.n == single.n
    np.testing.assert_allclose(f0.x, single.x, atol=1e-3)
    np.testing.assert_array_equal(f0.desc, single.desc)
    assert feats[1].n > 0


def test_extraction_step_matches_extract_batch():
    imgs = _images(n=2)
    buckets = default_bucket_spec(imgs.shape[1], imgs.shape[2], CFG,
                                  per_image_cap=512)
    dense = extraction_step(jnp.asarray(imgs), CFG, buckets)
    assert int(dense.overflow) == 0
    feats = extract_batch(imgs, CFG)
    n_batch = sum(f.n for f in feats)
    assert int(dense.valid.sum()) == n_batch
    # same keypoints (match by coordinates per image)
    v = np.asarray(dense.valid)
    dx = np.asarray(dense.x)[v]
    di = np.asarray(dense.img_idx)[v]
    for b, f in enumerate(feats):
        mine = np.sort(dx[di == b])
        ref = np.sort(f.x)
        np.testing.assert_allclose(mine, ref, atol=1e-3)


def test_sharded_step_matches_unsharded():
    n_dev = len(jax.devices())
    assert n_dev == 8
    imgs = _images(n=8)
    mesh = make_mesh()
    buckets = default_bucket_spec(imgs.shape[1], imgs.shape[2], CFG,
                                  per_image_cap=1024)
    step, in_sh = sharded_extraction_step(mesh, CFG, buckets)
    sharded = step(jax.device_put(jnp.asarray(imgs), in_sh))
    plain = extraction_step(jnp.asarray(imgs), CFG, buckets)
    np.testing.assert_array_equal(np.asarray(sharded.valid),
                                  np.asarray(plain.valid))
    v = np.asarray(plain.valid)
    np.testing.assert_allclose(np.asarray(sharded.x)[v],
                               np.asarray(plain.x)[v], atol=1e-3)
    np.testing.assert_allclose(np.asarray(sharded.desc)[v],
                               np.asarray(plain.desc)[v], atol=1.0)


def test_two_process_multihost(tmp_path):
    """Real multi-process jax.distributed smoke (SURVEY.md §4 item 4):
    two CPU processes + localhost coordinator run sharded extraction and
    cross-process ring kNN via tests/multihost_smoke.py — the same
    init_multihost + NamedSharding programs a TPU pod uses."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_smoke.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)   # workers set their own device count

    def run_workers(port_):
        procs = [
            subprocess.Popen(
                [_sys.executable, script, str(i), "2", str(port_),
                 str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True)
            for i in range(2)
        ]
        return procs, [p.communicate(timeout=600) for p in procs]

    procs, outs = run_workers(port)
    if any(p.returncode != 0 for p in procs):
        # the coordination service's ~10 s heartbeat is load-sensitive:
        # a concurrent compile job starving both workers kills the run
        # spuriously (observed under a parallel TPU bench).  One retry
        # on a fresh port separates that from a real collectives bug.
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs, outs = run_workers(port)
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"process {i} failed:\n{outs[i][0]}\n{outs[i][1]}")
    for i in range(2):
        with open(os.path.join(str(tmp_path), f"ok_{i}.json")) as f:
            rec = json.load(f)
        assert rec["n_desc"] > 0


def test_padded_extraction_matches_unpadded(golden_small):
    """Shape-bucket padding (mixed-size fleets): edge-pad + valid_hw
    reproduces the unpadded run — detection scan windows and patch
    border checks ride the true dims, so padding adds no keypoints."""
    from hesaff_tpu.utils.fleet import pad_to_bucket

    img = np.asarray(golden_small["gray"], np.float32)
    f0 = extract_batch(img[None], CFG)[0]
    padded, hw = pad_to_bucket(img, 64)
    assert padded.shape != img.shape
    f1 = extract_batch(padded[None], CFG,
                       valid_hw=np.asarray([hw], np.int32))[0]
    # same keypoint set within tolerance (near-edge affine windows may
    # sample replicated pad instead of out-of-image zeros)
    assert abs(f1.n - f0.n) <= max(2, 0.03 * f0.n)
    matched = 0
    for i in range(f0.n):
        dd = np.hypot(f1.x - f0.x[i], f1.y - f0.y[i])
        j = int(dd.argmin())
        if dd[j] < 0.25:
            matched += 1
            assert abs(f1.s[j] - f0.s[i]) < 0.05 * f0.s[i] + 1e-3
    assert matched >= 0.97 * f0.n


def test_pipelined_extraction_matches_staged():
    """2-stage (phase A | phase B) pipeline parallelism over a 2x2
    device grid equals the single-group staged step, microbatch by
    microbatch (SURVEY.md §2.2 PP row)."""
    from hesaff_tpu.dist import PipelinedExtractor, extraction_step_staged

    imgs = _images(n=4, h=96, w=96, seed=11)
    buckets = default_bucket_spec(96, 96, CFG, per_image_cap=256, batch=2)
    pipe = PipelinedExtractor(CFG, buckets, data_parallel=2)
    batches = [imgs[:2], imgs[2:]]
    outs = list(pipe(batches))
    assert len(outs) == 2
    for mb, out in zip(batches, outs):
        ref = extraction_step_staged(jnp.asarray(mb), CFG, buckets)
        assert np.array_equal(np.asarray(out.valid), np.asarray(ref.valid))
        v = np.asarray(ref.valid)
        for f in ("x", "y", "s", "a11", "a21", "a22", "response"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, f))[v],
                np.asarray(getattr(ref, f))[v], rtol=0, atol=1e-5)
        assert np.array_equal(np.asarray(out.desc)[v],
                              np.asarray(ref.desc)[v])
        assert int(out.overflow) == int(ref.overflow)


def test_drop_host_detection_and_restart(tmp_path):
    """Fault injection in the collectives path (SURVEY.md §5): one of
    two hosts dies mid-job; the survivor's liveness barrier converts
    the would-be collective hang into HostDropError within its timeout,
    checkpoints, and signals restart (rc 17).  The restarted
    single-process job resumes from the checkpoints and the combined
    results equal a straight dense run of every round."""
    import socket
    import subprocess
    import sys as _sys

    import jax.numpy as jnp

    from hesaff_tpu.match import knn2

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "drophost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)
    rounds, die_after = 3, 1
    procs = [
        subprocess.Popen(
            [_sys.executable, script, str(i), "2", str(port),
             str(tmp_path), str(rounds), str(die_after)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    out0 = procs[0].communicate(timeout=600)
    assert procs[0].returncode == 17, out0         # detected + restart
    procs[1].kill()                                # controller reaps the
    procs[1].communicate(timeout=60)               # wedged host

    with open(os.path.join(str(tmp_path), "cursor_0.json")) as f:
        cur = json.load(f)
    assert cur["completed"] == die_after
    assert cur["detected_drop_at"] == die_after

    # --- job restart: single process resumes from the checkpoints ---
    sys_path_dir = os.path.dirname(os.path.abspath(__file__))
    import importlib.util

    spec = importlib.util.spec_from_file_location("drophost_worker",
                                                  script)
    dw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dw)

    per = 32
    results = {}
    for r in range(cur["completed"]):          # completed shards on disk
        shards = [
            np.load(os.path.join(str(tmp_path),
                                 f"round{r}_shard{p}.npy"))
            for p in range(2)
        ]
        results[r] = np.concatenate(shards)
    for r in range(cur["completed"], rounds):  # recompute the rest
        q, db = dw.round_data(r, 2, per)
        results[r] = np.asarray(knn2(jnp.asarray(q), jnp.asarray(db)).idx)

    for r in range(rounds):                    # == dense ground truth
        q, db = dw.round_data(r, 2, per)
        want = np.asarray(knn2(jnp.asarray(q), jnp.asarray(db)).idx)
        assert np.array_equal(results[r].reshape(-1), want.reshape(-1)), r


def test_grouped_padded_matches_unpadded():
    """extraction_step_grouped with valid_hw on an edge-padded batch
    reproduces the unpadded grouped run: identical keypoint sets
    (detection windows + boundary checks ride the true dims) and
    near-identical descriptors — keypoints whose patch workspace
    samples the padded border may differ slightly (replicate-pad vs
    out-of-image zeros, the documented padded-mode tolerance)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "golden"))
    import gen_images

    from hesaff_tpu.config import HesaffConfig
    from hesaff_tpu.dist import default_group_spec, extraction_step_grouped
    from hesaff_tpu.utils.fleet import pad_to_bucket

    cfg = HesaffConfig()
    B, H, W = 2, 150, 170          # not multiples of 64: padding engages
    imgs = np.stack([
        gen_images.synth_image(W, H, seed=s).astype(np.float32).mean(-1)
        for s in range(B)
    ])
    groups_u = default_group_spec(H, W, cfg, per_image_cap=512, batch=B)
    ref = extraction_step_grouped(jnp.asarray(imgs), cfg, groups_u,
                                  interpret=True)
    padded, hw = zip(*[pad_to_bucket(im) for im in imgs])
    padded = np.stack(padded)
    Hp, Wp = padded.shape[-2:]
    groups_p = default_group_spec(Hp, Wp, cfg, per_image_cap=512, batch=B)
    out = extraction_step_grouped(
        jnp.asarray(padded), cfg, groups_p,
        valid_hw=np.asarray(hw, np.int32), interpret=True)

    rv = np.asarray(ref.valid)
    ov = np.asarray(out.valid)
    assert rv.sum() == ov.sum()
    assert int(ref.overflow) == int(out.overflow) == 0

    def keyed(d, v):
        return {
            (int(i), round(float(x), 3), round(float(y), 3),
             round(float(s), 3)): n
            for n, (i, x, y, s) in enumerate(zip(
                np.asarray(d.img_idx)[v], np.asarray(d.x)[v],
                np.asarray(d.y)[v], np.asarray(d.s)[v]))
        }

    rk = keyed(ref, rv)
    gk = keyed(out, ov)
    assert set(rk) == set(gk)
    rd = np.asarray(ref.desc)[rv].astype(int)
    od = np.asarray(out.desc)[ov].astype(int)
    diffs = np.array([np.abs(rd[rk[k]] - od[gk[k]]).max() for k in rk])
    assert (diffs <= 2).mean() >= 0.95
    assert diffs.mean() <= 0.3
