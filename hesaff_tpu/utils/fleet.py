"""Checkpointed, failure-isolated fleet extraction (SURVEY.md §5).

The reference drops errors silently and rewrites outputs wholesale; for
pod-scale corpora the framework needs: per-image error isolation (a bad
image must not kill the job), restartable progress (shard cursor), and
per-host work partitioning by index.

`extract_fleet` walks an image list in batches, catches per-batch
failures (falling back to per-image to isolate the bad one), writes one
.npz per image (natural checkpoints), and records a cursor file so a
restarted job resumes where it stopped.  In a multi-host job each host
calls it with its own index slice (host h takes paths[h::n_hosts]).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Callable, Sequence

import numpy as np


def _default_loader(path: str) -> np.ndarray:
    from hesaff_tpu.sift_io import load_image_gray

    return load_image_gray(path)


class HostDropError(RuntimeError):
    """A peer host failed to reach the liveness barrier (died/wedged)."""


def host_barrier(name: str, timeout_s: float = 60.0) -> None:
    """Liveness barrier for multi-host collective jobs (SURVEY.md §5
    failure detection).

    XLA collectives HANG indefinitely when a peer dies mid-job; calling
    this before each collective round converts a dropped host into a
    timely, catchable HostDropError, so survivors checkpoint their
    progress and the job restarts on the remaining hosts (see
    tests/drophost_worker.py for the recovery protocol).  Implemented
    on the jax.distributed coordination service's KV barrier — no
    device collectives involved, so it cannot itself hang past the
    timeout.  No-op in single-process jobs.
    """
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    try:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
    except Exception as e:  # noqa: BLE001 — any failure means a lost peer
        raise HostDropError(
            f"liveness barrier {name!r} failed after {timeout_s}s "
            f"(peer host dropped?): {e}") from e


def pad_to_bucket(img: np.ndarray, multiple: int = 64):
    """Edge-pad an image up to the next shape bucket.

    Mixed-size fleets recompile the whole pipeline per exact (H, W) —
    minutes per shape through the axon compile tunnel (SURVEY.md §7
    shape bucketing).  Rounding dims up to `multiple` bounds the number
    of compiled programs; extract_batch's valid_hw keeps detection scan
    windows and patch border checks on the TRUE dims, so padding adds
    no keypoints.  Returns (padded, (h, w)).
    """
    h, w = img.shape
    hp = ((h + multiple - 1) // multiple) * multiple
    wp = ((w + multiple - 1) // multiple) * multiple
    if hp == h and wp == w:
        return img, (h, w)
    return np.pad(img, ((0, hp - h), (0, wp - w)), mode="edge"), (h, w)


_GROUP_SPECS = {}


def _submit_chunk(imgs: np.ndarray, hws: np.ndarray, cfg,
                  per_image_cap: int = 1024):
    """Dispatch extraction for a shape-homogeneous padded chunk.

    On TPU the chunk rides the grouped fused-Pallas serving path
    (dist.extraction_step_grouped with valid_hw) — the same path the
    throughput bench measures — and returns WITHOUT synchronizing, so
    the caller can keep a chunk in flight while draining the previous
    one (each host sync costs ~10 tunnel round-trips).  On CPU the
    staged path runs synchronously.  Returns an opaque token for
    _drain_chunk.
    """
    import jax

    from hesaff_tpu.batch import extract_batch

    B, H, W = imgs.shape
    if jax.default_backend() == "tpu" and getattr(cfg, "use_pallas", True):
        from hesaff_tpu.dist import default_group_spec, \
            extraction_step_grouped

        # cfg is part of the key: default_group_spec reads mr_size /
        # patch-workspace fields, so two cfgs must not share a spec
        key = (H, W, B, per_image_cap, cfg)
        groups = _GROUP_SPECS.get(key)
        if groups is None:
            groups = default_group_spec(H, W, cfg,
                                        per_image_cap=per_image_cap,
                                        batch=B)
            _GROUP_SPECS[key] = groups
        out = extraction_step_grouped(imgs, cfg, groups, valid_hw=hws)
        return ("grouped", out, imgs, hws, B)
    return ("staged", extract_batch(imgs, cfg, valid_hw=hws))


def _drain_chunk(token, cfg):
    """Synchronize a _submit_chunk token -> list of Features.

    A grouped chunk whose fixed capacities overflowed reruns through
    the uncapped staged batch.extract_batch (correctness first — no
    keypoint is silently dropped)."""
    from hesaff_tpu.batch import extract_batch
    from hesaff_tpu.pipeline import Features

    if token[0] == "staged":
        return token[1]
    _, out, imgs, hws, B = token
    if int(np.asarray(out.overflow)) == 0:
        valid = np.asarray(out.valid)
        gi = np.asarray(out.img_idx)
        fields = {k: np.asarray(getattr(out, k)) for k in
                  ("x", "y", "s", "a11", "a12", "a21", "a22",
                   "response", "type", "desc")}
        feats = []
        for b in range(B):
            m = valid & (gi == b)
            feats.append(Features(**{k: fields[k][m] for k in fields}))
        return feats
    return extract_batch(imgs, cfg, valid_hw=hws)


def _extract_chunk(imgs: np.ndarray, hws: np.ndarray, cfg,
                   per_image_cap: int = 1024):
    """Synchronous submit+drain (single-chunk callers, warm-up)."""
    return _drain_chunk(_submit_chunk(imgs, hws, cfg, per_image_cap),
                        cfg)


def extract_fleet(paths: Sequence[str], out_dir: str, cfg=None,
                  batch_size: int = 8,
                  loader: Callable[[str], np.ndarray] = _default_loader,
                  log: Callable[[str], None] = print,
                  prefetch: bool = True):
    """Extract features for `paths`, checkpointed + failure isolated.

    Writes <out_dir>/<basename>.npz per image and a cursor.json with
    {done: [...], failed: {path: error}}.  Re-running skips completed
    images.  Returns the cursor dict.

    With `prefetch` (default) and the default loader, images are read,
    decoded, and padded by the native C++ thread pool
    (native.PrefetchLoader) ahead of the device loop, so host decode
    overlaps device compute; formats the native decoders don't cover
    fall back to the Python loader per image.
    """
    from hesaff_tpu.batch import extract_batch
    from hesaff_tpu.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    os.makedirs(out_dir, exist_ok=True)
    cursor_path = os.path.join(out_dir, "cursor.json")
    cursor = {"done": [], "failed": {}}
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            cursor = json.load(f)
    done = set(cursor["done"])

    def save_cursor():
        tmp = cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cursor, f)
        os.replace(tmp, cursor_path)

    def write_one(path, feats):
        base = os.path.splitext(os.path.basename(path))[0]
        # uncompressed: the bulk is uint8 descriptors (near-random bins,
        # deflate gains <10%) and zlib cost serialized the device loop —
        # measured ~30% of fleet wall at round-4's 4.8 img/s
        np.savez(
            os.path.join(out_dir, base + ".npz"),
            x=feats.x, y=feats.y, s=feats.s,
            a11=feats.a11, a12=feats.a12, a21=feats.a21, a22=feats.a22,
            response=feats.response, type=feats.type, desc=feats.desc,
        )

    def run_one(path, img=None, true_hw=None):
        if img is None:
            img, true_hw = pad_to_bucket(loader(path))
        feats = extract_batch(img[None], cfg,
                              valid_hw=np.asarray([true_hw], np.int32))[0]
        write_one(path, feats)

    pending = [p for p in paths if p not in done
               and p not in cursor["failed"]]

    stream = None
    if prefetch and loader is _default_loader and pending:
        from hesaff_tpu import native

        if native.available():
            try:
                stream = native.PrefetchLoader(pending)
            except RuntimeError:
                stream = None

    prefetched = {}  # path -> (img_or_None, hw_or_None)

    def load_padded(path):
        # pull from the native stream until `path` surfaces (an earlier
        # mid-chunk exception can leave the consumer behind the stream;
        # buffering keeps them in sync without re-decoding)
        while (stream is not None and path not in prefetched
               and len(prefetched) <= 2 * batch_size):
            try:
                sp, img, hw = next(stream)
            except StopIteration:
                break
            prefetched[sp] = (img, hw)
        img, hw = prefetched.pop(path, (None, None))
        if img is not None:
            return img, hw
        return pad_to_bucket(loader(path))

    import concurrent.futures as _fut

    writer = _fut.ThreadPoolExecutor(max_workers=1)

    def drain(rec):
        """Synchronize one submitted chunk: convert, write, checkpoint.

        npz writes ride the background writer thread so disk IO
        overlaps the next chunk's device work; completion is awaited
        before save_cursor marks the chunk done (crash consistency).
        Failures fall back to per-image retries so one bad image
        cannot take down the chunk."""
        writes = []
        try:
            for unit in rec["units"]:
                if unit[0] == "tok":
                    _, paths_u, tok = unit
                    feats = _drain_chunk(tok, cfg)
                    for p, f in zip(paths_u, feats):
                        writes.append((p, writer.submit(write_one, p, f)))
                else:
                    _, p, im, hw = unit
                    run_one(p, im, hw)
                    cursor["done"].append(p)
            for p, fut in writes:
                fut.result()
                cursor["done"].append(p)
        except Exception:
            for p, fut in writes:
                try:
                    fut.result()
                    if p not in cursor["done"]:
                        cursor["done"].append(p)
                except Exception:
                    pass
            # isolate: retry each image alone; only the bad one fails
            for p in rec["chunk"]:
                if p in cursor["done"] or p in cursor["failed"]:
                    continue
                try:
                    run_one(p)
                    cursor["done"].append(p)
                except Exception as e:  # noqa: BLE001 — keep job alive
                    cursor["failed"][p] = "".join(
                        traceback.format_exception_only(type(e), e)
                    ).strip()
                    log(f"extract_fleet: FAILED {p}: "
                        f"{cursor['failed'][p]}")
        save_cursor()

    inflight = None
    try:
        i = 0
        while i < len(pending):
            chunk = pending[i:i + batch_size]
            i += batch_size
            units = []
            try:
                imgs = [load_padded(p) for p in chunk]
                by_bucket = {}
                for p, (im, hw) in zip(chunk, imgs):
                    by_bucket.setdefault(im.shape, []).append((p, im, hw))
                for group in by_bucket.values():
                    if len(group) > 1:
                        # async dispatch: the chunk stays IN FLIGHT
                        # while the previous one drains below — the
                        # device computes through the host's convert/
                        # write/checkpoint work (each drain costs ~10
                        # tunnel round-trips otherwise spent idle)
                        tok = _submit_chunk(
                            np.stack([im for _, im, _ in group]),
                            np.asarray([hw for _, _, hw in group],
                                       np.int32), cfg)
                        units.append(
                            ("tok", [p for p, _, _ in group], tok))
                    else:
                        units.append(("one",) + group[0])
            except Exception:
                # load/submit failure: isolate per image immediately
                units = []
                for p in chunk:
                    prefetched.pop(p, None)
                    if p in cursor["done"]:
                        continue
                    try:
                        run_one(p)
                        cursor["done"].append(p)
                    except Exception as e:  # noqa: BLE001
                        cursor["failed"][p] = "".join(
                            traceback.format_exception_only(type(e), e)
                        ).strip()
                        log(f"extract_fleet: FAILED {p}: "
                            f"{cursor['failed'][p]}")
                save_cursor()
            # realign the stream to the chunk boundary: a mid-chunk
            # exception can leave undelivered paths in flight; draining
            # here keeps later chunks prefetched and frees their slots
            if stream is not None:
                try:
                    while stream.pos < i:
                        next(stream)
                except StopIteration:
                    pass
            prefetched.clear()
            if inflight is not None:
                drain(inflight)
            inflight = {"chunk": chunk, "units": units} if units else None
        if inflight is not None:
            drain(inflight)
    finally:
        writer.shutdown(wait=True)
        if stream is not None:
            stream.close()
    return cursor
