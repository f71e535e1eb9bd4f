"""Tests for fixed-capacity masked NN matching.

Goldens via brute-force numpy cosine argmin over the masked ROIs (the
reference algorithm, utils/pcd.py:177-216, reimplemented from its definition).
"""
import jax
import jax.numpy as jnp
import numpy as np

from oryon_tpu.ops import nn_correspondences, nn_correspondences_anchors, MatchParams
from oryon_tpu.ops.matching import nn_correspondences_batch
from oryon_tpu.ops.sampling import masked_select, masked_sample

H = W = 48
D = 8
PARAMS = MatchParams(src_capacity=256, max_corrs=64, dist_th=0.25, chunk=48 * 8)


def brute_force_match(f1, f2, m1, m2):
    """All masked src pixels -> best masked tgt pixel by cosine distance."""
    src = np.stack(np.nonzero(m1), 1)
    tgt = np.stack(np.nonzero(m2), 1)
    sf = f1[src[:, 0], src[:, 1]]
    tf = f2[tgt[:, 0], tgt[:, 1]]
    sf = sf / np.linalg.norm(sf, axis=1, keepdims=True)
    tf = tf / np.linalg.norm(tf, axis=1, keepdims=True)
    dist = 0.5 * (1 - sf @ tf.T)
    arg = dist.argmin(1)
    return {tuple(s): (tuple(tgt[a]), dist[i, a]) for i, (s, a) in enumerate(zip(src, arg))}


def make_pair(rng, n1=100, n2=150):
    f1 = rng.randn(H, W, D).astype(np.float32)
    f2 = rng.randn(H, W, D).astype(np.float32)
    m1 = np.zeros((H, W), np.uint8)
    m2 = np.zeros((H, W), np.uint8)
    idx1 = rng.choice(H * W, n1, replace=False)
    idx2 = rng.choice(H * W, n2, replace=False)
    m1.flat[idx1] = 1
    m2.flat[idx2] = 1
    # plant exact matches so some pairs clear the 0.25 threshold
    s_planted = np.stack(np.nonzero(m1), 1)[:40]
    t_planted = np.stack(np.nonzero(m2), 1)[:40]
    f2[t_planted[:, 0], t_planted[:, 1]] = f1[s_planted[:, 0], s_planted[:, 1]]
    return f1, f2, m1, m2


def test_matches_agree_with_bruteforce(rng):
    """Mechanism check: fp32 streaming argmin is EXACTLY the brute force."""
    f1, f2, m1, m2 = make_pair(rng)
    golden = brute_force_match(f1, f2, m1, m2)
    params = MatchParams(**{**PARAMS.__dict__, "precision": "fp32"})
    out = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(m1), jnp.array(m2),
                             jax.random.PRNGKey(0), params)
    rows = np.asarray(out.yx)
    valid = np.asarray(out.valid)
    dists = np.asarray(out.min_dist)
    assert valid.any()
    for row, v, d in zip(rows, valid, dists):
        if not v:
            continue
        s = (row[0], row[1])
        assert s in golden, f"source {s} not in mask1"
        t_gold, d_gold = golden[s]
        assert (row[2], row[3]) == t_gold
        assert abs(d - d_gold) < 1e-4
        assert d < PARAMS.dist_th


def test_all_valid_rows_under_threshold_and_planted_found(rng):
    f1, f2, m1, m2 = make_pair(rng)
    out = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(m1), jnp.array(m2),
                             jax.random.PRNGKey(1), PARAMS)
    n_valid = int(np.asarray(out.valid).sum())
    # 40 planted exact matches exist -> at least most of them found
    assert n_valid >= 35
    assert (np.asarray(out.min_dist)[np.asarray(out.valid)] < PARAMS.dist_th).all()


def test_empty_masks_yield_no_valid(rng):
    f1, f2, m1, m2 = make_pair(rng)
    z = np.zeros_like(m1)
    out = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(z), jnp.array(m2),
                             jax.random.PRNGKey(0), PARAMS)
    assert not np.asarray(out.valid).any()
    # impossible threshold -> nothing clears it
    strict = MatchParams(src_capacity=256, max_corrs=64, dist_th=-1.0, chunk=48 * 8)
    out2 = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(m1), jnp.array(m2),
                              jax.random.PRNGKey(0), strict)
    assert not np.asarray(out2.valid).any()


def test_anchor_variant(rng):
    f1, f2, m1, m2 = make_pair(rng)
    golden = brute_force_match(f1, f2, m1, m2)
    anchors = np.stack(np.nonzero(m1), 1)[:32].astype(np.int32)
    rows = np.asarray(nn_correspondences_anchors(
        jnp.array(f1), jnp.array(f2), jnp.array(anchors), jnp.array(m2), chunk=48 * 8))
    for row in rows:
        t_gold, _ = golden[(row[0], row[1])]
        assert (row[2], row[3]) == t_gold


def test_batched_matching(rng):
    pairs = [make_pair(rng) for _ in range(3)]
    f1 = jnp.array(np.stack([p[0] for p in pairs]))
    f2 = jnp.array(np.stack([p[1] for p in pairs]))
    m1 = jnp.array(np.stack([p[2] for p in pairs]))
    m2 = jnp.array(np.stack([p[3] for p in pairs]))
    out = nn_correspondences_batch(f1, f2, m1, m2, jax.random.PRNGKey(2), PARAMS)
    assert out.yx.shape == (3, PARAMS.max_corrs, 4)
    for b in range(3):
        golden = brute_force_match(*pairs[b])
        rows, valid = np.asarray(out.yx[b]), np.asarray(out.valid[b])
        assert valid.any()
        for row, v in zip(rows, valid):
            if v:
                assert golden[(row[0], row[1])][0] == (row[2], row[3])


def test_masked_select_counts(rng):
    mask = np.zeros(1000, np.uint8)
    mask[rng.choice(1000, 100, replace=False)] = 1
    idx, valid = masked_select(jnp.array(mask), jax.random.PRNGKey(0), 64)
    assert valid.all()  # plenty of candidates
    assert mask[np.asarray(idx)].all()
    # capacity above pool size: exactly 100 valid
    idx2, valid2 = masked_select(jnp.array(mask), jax.random.PRNGKey(1), 256)
    assert int(np.asarray(valid2).sum()) == 100
    assert mask[np.asarray(idx2)[np.asarray(valid2)]].all()
    assert len(np.unique(np.asarray(idx2)[np.asarray(valid2)])) == 100


def test_masked_sample_distribution(rng):
    w = np.zeros(100, np.float32)
    w[:10] = 1.0
    idx, valid = masked_sample(jnp.array(w), jax.random.PRNGKey(0), 50)
    got = np.asarray(idx)[np.asarray(valid)]
    assert int(np.asarray(valid).sum()) == 10
    assert (got < 10).all()


def test_pallas_kernel_matches_streaming(rng):
    """Fused pallas masked-argmin (interpret mode on CPU) == brute force."""
    import functools
    from jax.experimental import pallas as pl
    import oryon_tpu.ops.pallas.match_kernel as mk
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        S, N, Dd = 256, 512, 32
        src = rng.randn(S, Dd).astype(np.float32)
        src /= np.linalg.norm(src, axis=1, keepdims=True)
        tgt = rng.randn(N, Dd).astype(np.float32)
        tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
        bad = rng.rand(N) > 0.6
        md, am = mk.masked_argmin_pallas(jnp.array(src), jnp.array(tgt),
                                         jnp.array(bad), src_tile=128,
                                         tgt_chunk=256)
        dist = 0.5 * (1 - src @ tgt.T)
        dist[:, bad] = np.inf
        assert (np.asarray(am) == dist.argmin(1)).all()
        np.testing.assert_allclose(np.asarray(md), dist.min(1), atol=1e-5)
    finally:
        pl.pallas_call = orig


def test_bf16_matching_close_to_fp32(rng):
    """The production bf16-multiply/f32-accumulate path picks (nearly) the
    same matches as fp32: distance drift < 2e-3, argmin flips only at
    near-ties (measured 99.3% identical on production shapes — see
    MatchParams.precision)."""
    f1, f2, m1, m2 = make_pair(rng)
    p32 = MatchParams(**{**PARAMS.__dict__, "precision": "fp32"})
    p16 = MatchParams(**{**PARAMS.__dict__, "precision": "bf16"})
    key = jax.random.PRNGKey(0)
    o32 = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(m1),
                             jnp.array(m2), key, p32)
    o16 = nn_correspondences(jnp.array(f1), jnp.array(f2), jnp.array(m1),
                             jnp.array(m2), key, p16)
    v = np.asarray(o32.valid) & np.asarray(o16.valid)
    assert v.sum() > 10
    d32 = np.asarray(o32.min_dist)[v]
    d16 = np.asarray(o16.min_dist)[v]
    assert np.abs(d32 - d16).max() < 4e-3
    same = (np.asarray(o32.yx)[v] == np.asarray(o16.yx)[v]).all(1).mean()
    assert same > 0.9, f"only {same:.2%} of matches identical"


def test_capacity_insensitivity(rng):
    """SURVEY §7 risk 2: the fixed source capacity replaces the reference's
    ragged ROI extraction; when the mask population fits under BOTH
    capacities, the matched correspondence SET must be identical — proving
    the score can't depend on the chosen capacity headroom."""
    H = W = 32
    D = 8
    f1 = rng.randn(H, W, D).astype(np.float32)
    f2 = rng.randn(H, W, D).astype(np.float32)
    m1 = np.zeros((H, W), np.uint8)
    m2 = np.zeros((H, W), np.uint8)
    m1[4:12, 6:16] = 1   # 80 masked source pixels
    m2[10:26, 8:24] = 1
    key = jax.random.PRNGKey(0)

    def run(cap):
        p = MatchParams(src_capacity=cap, max_corrs=128, dist_th=2.0,
                        chunk=32 * 32)
        c = nn_correspondences(jnp.array(f1), jnp.array(f2),
                               jnp.array(m1), jnp.array(m2), key, p)
        rows = np.asarray(c.yx)[np.asarray(c.valid)]
        return set(map(tuple, rows.tolist()))

    small, large = run(128), run(512)
    assert small == large and len(small) > 50
