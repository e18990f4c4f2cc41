"""Retrieval tests: voting correctness + sharded == dense."""

import numpy as np

from hesaff_tpu.retrieval import (
    build_index,
    query_votes,
    rank_images,
    sharded_query_votes,
)
from hesaff_tpu.dist import make_mesh


def make_corpus(n_images=12, per_image=60, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (per_image, 128)).astype(np.uint8)
            for _ in range(n_images)]


def test_rank_images_finds_source():
    corpus = make_corpus()
    index = build_index(corpus)
    rng = np.random.RandomState(1)
    # query = noisy subset of image 7's descriptors
    q = np.clip(corpus[7][:40].astype(np.int32)
                + rng.randint(-3, 4, (40, 128)), 0, 255).astype(np.uint8)
    ranked = rank_images(index, q)
    assert ranked[0][0] == 7
    assert ranked[0][1] >= 35


def test_empty_query():
    index = build_index(make_corpus())
    votes, matches = query_votes(index, np.zeros((0, 128), np.uint8))
    assert votes.sum() == 0 and len(matches) == 0


def test_sharded_votes_match_dense():
    corpus = make_corpus(n_images=10, per_image=48)
    index = build_index(corpus)
    rng = np.random.RandomState(2)
    q = np.clip(corpus[3][:30].astype(np.int32)
                + rng.randint(-3, 4, (30, 128)), 0, 255).astype(np.uint8)
    votes_dense, _ = query_votes(index, q, ratio=0.9)
    mesh = make_mesh()
    votes_sharded = sharded_query_votes(mesh, index, q, ratio=0.9)
    np.testing.assert_array_equal(votes_sharded, votes_dense)


def test_cli_retrieve_self_top1(tmp_path):
    """fleet -> retrieve: querying with a database image ranks itself
    first (end-to-end CLI over the .npz feature database)."""
    from hesaff_tpu.cli import main
    from hesaff_tpu.utils.fleet import extract_fleet
    from tests.golden.gen_images import synth_image, write_ppm

    paths = []
    for i in range(3):
        p = str(tmp_path / f"db{i}.ppm")
        write_ppm(p, synth_image(96, 80, seed=i))
        paths.append(p)
    out = str(tmp_path / "feats")
    cursor = extract_fleet(paths, out, batch_size=3, log=lambda s: None)
    assert len(cursor["done"]) == 3

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["retrieve", paths[1], "--db", out, "--topk", "3"])
    assert rc == 0
    lines = [l.split() for l in buf.getvalue().strip().splitlines()]
    assert lines, "no ranking printed"
    assert lines[0][0] == "db1"
    assert int(lines[0][1]) > int(lines[-1][1]) or len(lines) == 1
