"""Detection golden tests: localized keypoint sets vs the oracle.

Matching is by geometry with tight tolerances rather than exact set
equality: f32-vs-C++ rounding legitimately flips ~1% of borderline
NMS/threshold decisions (see .claude/skills/verify/SKILL.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.detect import dedup_octave, detect_level
from hesaff_tpu.pyramid import build_octave, level_sigmas, prepare_first_level

CFG = HesaffConfig()


def run_detection(gray):
    first, pd = prepare_first_level(jnp.asarray(gray), CFG)
    sig = level_sigmas(CFG)
    out = []
    cur = first
    while (cur.shape[0] > CFG.min_octave_size
           and cur.shape[1] > CFG.min_octave_size):
        H, W = cur.shape
        o = build_octave(cur, pd, CFG)
        cap = CFG.level_capacity(H, W)
        levels = [
            detect_level(o.resps[l - 1], o.resps[l], o.resps[l + 1],
                         o.blurs[l], sig[l], pd, cap, CFG)
            for l in (1, 2, 3)
        ]
        levels = dedup_octave(levels, H, W)
        for lk in levels:
            ok = np.asarray(lk.ok)
            for j in np.nonzero(ok)[0]:
                out.append((float(lk.x[j]), float(lk.y[j]), float(lk.s[j]),
                            pd, int(lk.type[j]), float(lk.response[j])))
        cur = o.next_first
        pd *= 2.0
    return np.asarray(out)


@pytest.mark.parametrize("pack", ["golden_small", "golden_mid"])
def test_keypoints_match_oracle(pack, request):
    golden = request.getfixturevalue(pack)
    g = golden["hess_keypoints"]  # x,y,s,pd,type,resp
    mine = run_detection(golden["gray"])

    matched = 0
    close = 0
    for row in g:
        cand = mine[mine[:, 3] == row[3]]
        if len(cand) == 0:
            continue
        dd = np.hypot(cand[:, 0] - row[0], cand[:, 1] - row[1])
        i = dd.argmin()
        if dd[i] < 0.3 * row[3]:
            matched += 1
            if (abs(cand[i, 2] - row[2]) < 0.02 * row[2]
                    and abs(cand[i, 5] - row[5]) < 0.02 * abs(row[5])
                    and cand[i, 4] == row[4]):
                close += 1
    # >= 97% of oracle keypoints found, every found one numerically tight
    assert matched >= 0.97 * len(g)
    assert close == matched
    # and no spurious extras: counts within 2%
    assert abs(len(mine) - len(g)) <= max(2, 0.02 * len(g))


def test_flat_image_no_keypoints():
    flat = np.full((64, 64), 77.0, np.float32)
    assert len(run_detection(flat)) == 0


def test_tiny_image_no_octaves():
    tiny = (np.random.RandomState(0).rand(13, 13) * 255).astype(np.float32)
    assert len(run_detection(tiny)) == 0


def test_detect_octave_batch_matches_per_image(golden_small):
    """The flat cross-image walk path (batch production path) equals the
    per-image vmapped reference path slot for slot — same helpers, same
    arithmetic, only the walk harness differs."""
    import jax

    from hesaff_tpu.batch import _detect_one_octave
    from hesaff_tpu.detect import detect_octave_batch

    cfg = HesaffConfig()
    g1 = golden_small["gray"]
    g2 = np.ascontiguousarray(g1[::-1, ::-1])
    imgs = jnp.asarray(np.stack([g1, g2]))
    first = jax.vmap(lambda im: prepare_first_level(im, cfg)[0])(imgs)
    o = jax.vmap(lambda f: build_octave(f, 1.0, cfg))(first)
    sig = level_sigmas(cfg)

    ref = jax.vmap(
        lambda r, b: _detect_one_octave(r, b, sig, 1.0, cfg, octave=0)
    )(o.resps, o.blurs)
    got = detect_octave_batch(o.resps, o.blurs, sig, 1.0, cfg, octave=0)

    assert np.array_equal(np.asarray(got["ok"]), np.asarray(ref["ok"]))
    v = np.asarray(ref["ok"])
    for k in ("level", "type"):
        np.testing.assert_array_equal(np.asarray(got[k])[v],
                                      np.asarray(ref[k])[v], err_msg=k)
    for k in ("x", "y", "s", "response"):
        # identical arithmetic; the per-candidate scale rides as data in
        # the flat path vs a trace-time constant per level — 1-ulp fusion
        np.testing.assert_allclose(np.asarray(got[k])[v],
                                   np.asarray(ref[k])[v],
                                   rtol=3e-7, atol=0, err_msg=k)
    np.testing.assert_array_equal(np.asarray(got["overflow"]),
                                  np.asarray(ref["overflow"]))
    np.testing.assert_array_equal(np.asarray(got["n_cand"]),
                                  np.asarray(ref["n_cand"]))


def test_dense_walk_matches_sparse_batch():
    """The packed dense pointer-composition walk (detect_octave_batch_dense)
    must reproduce the sparse per-candidate walk slot-for-slot: same ok
    masks, same levels/coords/response/type bits (s carries a <=1-ulp
    exp2 lowering-context wobble), same overflow and candidate counts."""
    import jax

    from hesaff_tpu import detect
    from hesaff_tpu.pyramid import (build_octave, level_sigmas,
                                    prepare_first_level)

    cfg = HesaffConfig()
    rng = np.random.default_rng(0)
    B, H, W = 3, 160, 200
    imgs = rng.normal(128, 50, (B, H, W)).astype(np.float32)
    for _ in range(4):
        for ax in (-1, -2):
            imgs = (np.roll(imgs, 1, ax) + imgs
                    + np.roll(imgs, -1, ax)) / 3.0
    imgs = jnp.asarray(imgs)
    sig = level_sigmas(cfg)
    first = jax.vmap(lambda im: prepare_first_level(im, cfg)[0])(imgs)
    o = jax.vmap(lambda f: build_octave(f, 1.0, cfg))(first)

    saved = detect._DETECT_DENSE
    try:
        detect._DETECT_DENSE = False
        sp = jax.tree.map(np.asarray, detect.detect_octave_batch(
            o.resps, o.blurs, sig, 1.0, cfg, octave=0))
    finally:
        detect._DETECT_DENSE = saved
    dn = jax.tree.map(np.asarray, detect.detect_octave_batch_dense(
        o.resps, o.blurs, sig, 1.0, cfg, octave=0))

    assert sp["ok"].sum() > 200          # non-trivial scene
    np.testing.assert_array_equal(sp["ok"], dn["ok"])
    m = sp["ok"]
    for k in ("level", "x", "y", "response", "type"):
        np.testing.assert_array_equal(sp[k][m], dn[k][m])
    np.testing.assert_allclose(sp["s"][m], dn["s"][m], rtol=1e-6)
    assert int(sp["overflow"].sum()) == int(dn["overflow"].sum())
    assert int(sp["n_cand"].sum()) == int(dn["n_cand"].sum())
