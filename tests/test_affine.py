"""Affine adaptation golden tests: U matrices + iteration counts."""

import jax.numpy as jnp
import numpy as np

from hesaff_tpu.affine_shape import adapt_level
from hesaff_tpu.config import HesaffConfig
from hesaff_tpu.pyramid import build_octave, level_sigmas, prepare_first_level
from tests.test_detect import run_detection

CFG = HesaffConfig()


def test_affine_shapes_match_oracle(golden_small):
    """Full detect+affine chain vs the oracle's affine_shapes records."""
    g = golden_small["affine_shapes"]  # x,y,s,pd,u11,u12,u21,u22,type,resp,iters
    first, pd = prepare_first_level(jnp.asarray(golden_small["gray"]), CFG)
    sig = level_sigmas(CFG)
    recs = []
    cur = first
    while (cur.shape[0] > CFG.min_octave_size
           and cur.shape[1] > CFG.min_octave_size):
        from hesaff_tpu.detect import dedup_octave, detect_level

        H, W = cur.shape
        o = build_octave(cur, pd, CFG)
        cap = CFG.level_capacity(H, W)
        levels = [
            detect_level(o.resps[l - 1], o.resps[l], o.resps[l + 1],
                         o.blurs[l], sig[l], pd, cap, CFG)
            for l in (1, 2, 3)
        ]
        levels = dedup_octave(levels, H, W)
        for lvl_i, lk in zip((1, 2, 3), levels):
            safe = lambda a, d: jnp.where(lk.ok, a, d)
            ar = adapt_level(
                o.blurs[lvl_i - 1],
                safe(lk.x, (W // 2) * pd), safe(lk.y, (H // 2) * pd),
                safe(lk.s, 2.0 * pd), pd, CFG,
            )
            aok = np.asarray(ar.ok) & np.asarray(lk.ok)
            for j in np.nonzero(aok)[0]:
                recs.append((float(lk.x[j]), float(lk.y[j]), float(lk.s[j]),
                             pd, float(ar.u11[j]), float(ar.u12[j]),
                             float(ar.u21[j]), float(ar.u22[j]),
                             int(ar.iters[j])))
        cur = o.next_first
        pd *= 2.0
    mine = np.asarray(recs)

    matched = tight = 0
    for row in g:
        cand = mine[mine[:, 3] == row[3]]
        if len(cand) == 0:
            continue
        dd = np.hypot(cand[:, 0] - row[0], cand[:, 1] - row[1])
        i = dd.argmin()
        if dd[i] < 0.3 * row[3]:
            matched += 1
            if (np.abs(cand[i, 4:8] - row[4:8]).max() < 0.02
                    and cand[i, 8] == row[10]):
                tight += 1
    assert matched >= 0.97 * len(g)
    assert tight >= 0.98 * matched  # U entries within 0.02, same iter count
    assert abs(len(mine) - len(g)) <= max(2, 0.02 * len(g))


def test_nonconverging_on_flat_window():
    """A flat blur image yields zero gradients -> SMM singular -> no
    convergence, matching the reference's silent drop (affine.cpp:99)."""
    blur = jnp.zeros((64, 64), jnp.float32)
    r = adapt_level(blur, jnp.asarray([32.0]), jnp.asarray([32.0]),
                    jnp.asarray([2.0]), 1.0, CFG)
    assert not bool(r.ok[0])


def test_onehot_window_sample_orientations_agree():
    """The two quantization orientations of the twin sampler
    (quantize_x selection-blend vs legacy Ey-matmul) compute the same
    bilinear interpolation — on CPU (f32) they must agree to float
    reassociation level and flag the same OOB/out-of-window samples."""
    import jax.numpy as jnp
    import numpy as np

    from hesaff_tpu.ops.warp import onehot_window_sample

    rng = np.random.default_rng(11)
    H = W = 64
    win = 32
    window = jnp.asarray(rng.normal(128, 40, (win, win)).astype(np.float32))
    r0 = jnp.int32(10)
    c0 = jnp.int32(12)
    N = 200
    wy = jnp.asarray(rng.uniform(8, 45, N).astype(np.float32))
    wx = jnp.asarray(rng.uniform(10, 47, N).astype(np.float32))
    a = onehot_window_sample(window, r0, c0, wy, wx, H, W,
                             quantize_x=False)
    b = onehot_window_sample(window, r0, c0, wy, wx, H, W,
                             quantize_x=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=2e-6, atol=2e-4)
    assert bool(a[1]) == bool(b[1])
    assert bool(a[2]) == bool(b[2])
