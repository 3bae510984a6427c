"""Sketch contracts: dims, one/two-sided error, published (eps, delta)
bounds (precision_sketch.c semantics), serde, conservative-update
sandwich, MG/HLL/Bloom/KLL guarantees."""

import numpy as np
import pytest

from heavy_hitters_spark.core import (
    HLL,
    KLL,
    Bloom,
    CountMin,
    CountSketch,
    MisraGries,
    SeedStream,
    Sketch,
)


def exact_counts(items, weights=None, size=None):
    size = size or int(items.max()) + 1
    return np.bincount(
        items.astype(np.int64), weights=weights, minlength=size
    ).astype(np.int64)


def test_cm_exact_on_small_stream(micro_pairs):
    """Single/low-collision streams recover exactly
    (tests/test_sketch_count_min.c:56-86)."""
    items, w = micro_pairs
    cm = CountMin(epsilon=0.01, delta=0.05, b=2, seed_stream=SeedStream(1, 2))
    cm.update_batch(items, w)
    assert np.array_equal(cm.point(items), w)


def test_cm_one_sided(rng):
    data = rng.integers(0, 5000, 200000, dtype=np.uint64)
    cm = CountMin(width=256, depth=4, seed_stream=SeedStream(1, 2))
    cm.update_batch(data)
    exact = exact_counts(data, size=5000)
    assert np.all(cm.point(np.arange(5000)) >= exact)
    assert cm.norm == len(data)


def test_cm_epsilon_delta_bound(rng):
    """|est - exact| <= eps*L1 for >= 1-delta of the universe
    (src/precision_sketch.c:282-308)."""
    eps, delta, b = 1 / 64, 0.1, 4
    data = (rng.zipf(1.3, 100000) % 10000).astype(np.uint64)
    cm = CountMin(epsilon=eps, delta=delta, b=b, seed_stream=SeedStream(1, 2))
    cm.update_batch(data)
    exact = exact_counts(data, size=10000)
    err = cm.point(np.arange(10000)) - exact
    violation_rate = (err > eps * cm.norm).mean()
    assert violation_rate <= delta


def test_cm_above_threshold_and_range(micro_pairs):
    items, w = micro_pairs
    cm = CountMin(epsilon=0.001, delta=0.05, b=2, seed_stream=SeedStream(1, 2))
    cm.update_batch(items, w)
    assert cm.above_threshold(np.array([327]), 78923)[0]
    assert not cm.above_threshold(np.array([4]), 1000)[0]
    # naive range parity: sum of points (count_min.c:147-156)
    assert cm.range_sum(1, 9) == int(cm.point(np.arange(1, 10)).sum())


def test_cs_exact_small_and_unbiased(micro_pairs, rng):
    items, w = micro_pairs
    cs = CountSketch(epsilon=0.05, delta=0.05, b=4, seed_stream=SeedStream(1, 2))
    cs.update_batch(items, w)
    assert np.array_equal(cs.point(items), w)
    # two-sided error within eps*L2
    data = (rng.zipf(1.5, 100000) % 4096).astype(np.uint64)
    cs2 = CountSketch(epsilon=1 / 32, delta=0.1, b=4, seed_stream=SeedStream(1, 2))
    cs2.update_batch(data)
    exact = exact_counts(data, size=4096)
    l2 = np.sqrt((exact.astype(float) ** 2).sum())
    err = np.abs(cs2.point(np.arange(4096)) - exact)
    assert (err > (1 / 32) * l2).mean() <= 0.1


def test_cs_turnstile_and_l2(rng):
    """Signed updates (strict turnstile) + AMS L2 in [sqrt(L1), L1]
    (tests/test_norm_l2_sketch.c:49-89)."""
    cs = CountSketch(width=1 << 12, depth=7, seed_stream=SeedStream(1, 2))
    items = rng.integers(0, 100, 5000, dtype=np.uint64)
    cs.update_batch(items, np.full(5000, 2, dtype=np.int64))
    cs.update_batch(items, np.full(5000, -1, dtype=np.int64))  # net +1 each
    exact = exact_counts(items, size=100)
    assert np.array_equal(cs.point(np.arange(100)), exact)
    l1 = exact.sum()
    l2_exact = np.sqrt((exact.astype(float) ** 2).sum())
    assert abs(cs.l2_norm() - l2_exact) / l2_exact < 0.2
    assert np.sqrt(l1) <= cs.l2_norm() <= l1


def test_cs_point_partial(micro_pairs):
    items, w = micro_pairs
    cs = CountSketch(width=1 << 10, depth=5, seed_stream=SeedStream(1, 2))
    cs.update_batch(items, w)
    # lower median of per-row partials equals point (count_median.c:102-143)
    partials = np.stack([cs.point_partial(items, r) for r in range(cs.d)])
    k = (cs.d - 1) // 2
    assert np.array_equal(np.partition(partials, k, axis=0)[k], cs.point(items))


def test_conservative_sandwich(rng):
    data = rng.integers(0, 2000, 100000, dtype=np.uint64)
    exact = exact_counts(data, size=2000)
    cu = CountMin(width=512, depth=4, seed_stream=SeedStream(1, 2), conservative=True)
    pl = CountMin(width=512, depth=4, seed_stream=SeedStream(1, 2))
    for chunk in np.array_split(data, 7):
        cu.update_batch(chunk)
        pl.update_batch(chunk)
    pc, pp = cu.point(np.arange(2000)), pl.point(np.arange(2000))
    assert np.all(pc >= exact)
    assert np.all(pc <= pp)
    assert pc.sum() < pp.sum()  # strictly tighter somewhere on this data


def test_misra_gries_bounds(rng):
    data = (rng.zipf(1.2, 100000) % 5000).astype(np.uint64)
    mg = MisraGries(k=128)
    for chunk in np.array_split(data, 13):
        mg.update_batch(chunk)
    exact = exact_counts(data, size=5000)
    est = mg.point(np.arange(5000))
    assert np.all(est <= exact)
    assert np.all(exact - est <= mg.norm / (mg.k + 1))
    # every item above the bound is in the summary
    heavy = np.where(exact > mg.norm / (mg.k + 1))[0]
    assert all(int(h) in mg.counters for h in heavy)


def test_hll_error(rng):
    for n in (1000, 50000, 300000):
        h = HLL(p=12)
        h.update_batch(rng.integers(0, 2**62, n, dtype=np.uint64))
        # 5-sigma tolerance on 1.04/sqrt(m)
        assert abs(h.estimate() - n) / n < 5 * h.rel_std_error() + 0.01


def test_bloom_rates(rng):
    bl = Bloom(capacity=20000, fpp=0.01)
    keys = rng.integers(0, 2**62, 20000, dtype=np.uint64)
    bl.update_batch(keys)
    assert bl.contains(keys[:1000]).all()  # no false negatives
    probe = rng.integers(2**62, 2**63, 20000, dtype=np.uint64)
    assert bl.contains(probe).mean() < 0.03


def test_kll_rank_error(rng):
    n = 200000
    kll = KLL(k=200)
    for chunk in np.array_split(rng.permutation(np.arange(n)), 9):
        kll.update_batch(chunk)
    qs = np.linspace(0.01, 0.99, 21)
    est = kll.quantile(qs)
    assert np.all(np.abs(est - qs * n) <= 0.02 * n)


def test_serde_roundtrip_all(micro_pairs, rng):
    items, w = micro_pairs
    data = rng.integers(0, 1000, 10000, dtype=np.uint64)
    sketches = [
        CountMin(width=256, depth=4, seed_stream=SeedStream(1, 2)),
        CountMin(width=256, depth=4, seed_stream=SeedStream(1, 2), conservative=True),
        CountSketch(width=256, depth=5, seed_stream=SeedStream(1, 2)),
        MisraGries(k=64),
        HLL(p=10),
        Bloom(capacity=5000),
        KLL(k=128),
    ]
    for s in sketches:
        s.update_batch(data)
        r = Sketch.from_bytes(s.to_bytes())
        assert type(r) is type(s)
        if hasattr(s, "point"):
            assert np.array_equal(r.point(np.arange(100)), s.point(np.arange(100)))
        if isinstance(s, HLL):
            assert r.estimate() == s.estimate()
        if isinstance(s, KLL):
            assert np.array_equal(r.quantile([0.5]), s.quantile([0.5]))
        if isinstance(s, Bloom):
            assert np.array_equal(r.contains(data[:50]), s.contains(data[:50]))


def test_tdigest_quantiles(rng):
    from heavy_hitters_spark.core import TDigest

    data = rng.lognormal(0, 2, 100000)
    td = TDigest(200)
    for chunk in np.array_split(data, 9):
        td.update_batch(chunk)
    qs = [0.01, 0.5, 0.99]
    exact = np.quantile(data, qs)
    assert np.all(np.abs(td.quantile(qs) - exact) / exact < 0.02)
    # merge preserves bounds
    t1, t2 = TDigest(200), TDigest(200)
    t1.update_batch(data[::2])
    t2.update_batch(data[1::2])
    t1.merge(t2)
    assert np.all(np.abs(t1.quantile(qs) - exact) / exact < 0.02)
    r = Sketch.from_bytes(t1.to_bytes())
    assert np.allclose(r.quantile(qs), t1.quantile(qs))


def test_weighted_stream(rng):
    """weighted generator mirror (datasets/Weighted/src/weighted.c:131-140):
    item i has weight proportional to (i+1)."""
    n = 500
    items = np.arange(n, dtype=np.uint64)
    weights = ((items.astype(np.int64) + 1)).astype(np.int64)
    cm = CountMin(epsilon=0.001, delta=0.01, b=2, seed_stream=SeedStream(1, 2))
    cm.update_batch(items, weights)
    assert np.array_equal(cm.point(items), weights)


def test_weighted_updates_exact_past_2_53():
    """Weighted batches whose per-cell sums exceed 2^53 must stay exact
    (float64-weighted bincount would truncate silently)."""
    big = (1 << 52) + 1
    n = 64  # dense-path trigger for w=8 (n >= 2*w)
    items = np.full(n, 7, dtype=np.uint64)
    counts = np.full(n, big, dtype=np.int64)
    cm = CountMin(width=8, depth=3, seed_stream=SeedStream(1, 2))
    cm.update_batch(items, counts)
    assert int(cm.point(np.array([7], dtype=np.uint64))[0]) == n * big
    cs = CountSketch(width=8, depth=3, seed_stream=SeedStream(1, 2))
    cs.update_batch(items, counts)
    assert int(cs.point(np.array([7], dtype=np.uint64))[0]) == n * big


def test_misra_gries_decrement_witness_on_ties():
    """Tie-heavy input can shrink MG below k counters (even to zero)
    while decrement > 0 — the decrement witness must reflect the true
    worst-case undercount so hybrid queries can gate on it."""
    mg = MisraGries(k=4)
    mg.update_batch(np.array([1, 2, 3, 4, 5], dtype=np.uint64))
    assert len(mg.counters) < 4
    assert mg.decrement >= 1
    # absent items are undercounted by at most decrement
    assert all(1 - mg.decrement <= int(e) for e in mg.point(np.arange(1, 6, dtype=np.uint64)))


def test_wire_pack_roundtrip():
    """Packed wire states (zlib envelope) round-trip and interop with
    raw HHS1 blobs; packing a fresh template is ~150x smaller (the
    partial-collect Amdahl term of the distributed build)."""
    import numpy as np

    from heavy_hitters_spark.core import CountMin, SeedStream
    from heavy_hitters_spark.core.base import pack_state, unpack_state

    cm = CountMin(width=1 << 12, depth=5, seed_stream=SeedStream(1, 2))
    cm.update_batch(np.arange(1000, dtype=np.uint64))
    raw = cm.to_bytes()
    packed = pack_state(cm)
    assert len(packed) < len(raw)
    for blob in (raw, packed):
        got = unpack_state(blob)
        assert got.to_bytes() == raw  # identical state either way


def test_unpack_state_rejects_garbage():
    import pytest as _pytest

    from heavy_hitters_spark.core.base import unpack_state

    with _pytest.raises(ValueError):
        unpack_state(b"NOPE" + b"\x00" * 16)


def test_pairs_by_size_edges():
    """Kernel pair expansion: empty input and all-singleton buckets
    produce empty output; cap drops oversized buckets only."""
    import numpy as np

    from heavy_hitters_spark.functions.dedup import _pairs_by_size

    e = np.empty(0, dtype=np.int64)
    a, b = _pairs_by_size(e, e, None)
    assert len(a) == 0 and len(b) == 0
    # singletons only
    a, b = _pairs_by_size(np.array([1, 2, 3]), np.array([10, 20, 30]), None)
    assert len(a) == 0
    # one pair bucket + one capped-out bucket
    key = np.array([5, 5, 9, 9, 9, 9])
    ids = np.array([2, 1, 7, 8, 9, 6])
    a, b = _pairs_by_size(key, ids, max_bucket_size=3)
    assert list(zip(a.tolist(), b.tolist())) == [(1, 2)]
    a, b = _pairs_by_size(key, ids, max_bucket_size=None)
    assert len(a) == 1 + 6  # pair + C(4,2)


def test_misra_gries_weighted_equals_collapsed_and_reference(rng):
    """The weighted update path (argsort + reduceat batch collapse,
    round-5 rewrite) must be byte-identical to (a) feeding the batch
    pre-collapsed to sorted (unique, counts) — the map-side-combine
    contract PREAGG_SAFE relies on — and (b) the straightforward
    unique(return_inverse) + add.at reference collapse it replaced.
    Also: a weighted batch of unit counts == the unweighted path."""
    items = (rng.zipf(1.3, 20000) % 3000).astype(np.uint64)
    w = rng.integers(0, 5, len(items)).astype(np.int64)  # includes zeros

    mg_w = MisraGries(k=64)
    mg_w.update_batch(items, w)

    # (a) pre-collapsed equivalent batch
    ux, inv = np.unique(items, return_inverse=True)
    uc = np.zeros(len(ux), dtype=np.int64)
    np.add.at(uc, inv, w)
    mg_c = MisraGries(k=64)
    mg_c.update_batch(ux, uc)
    assert mg_w.to_bytes() == mg_c.to_bytes()

    # (b) multi-chunk weighted stream == same chunks collapsed per chunk
    mg_s, mg_s2 = MisraGries(k=64), MisraGries(k=64)
    for lo in range(0, len(items), 4096):
        xi, wi = items[lo:lo + 4096], w[lo:lo + 4096]
        mg_s.update_batch(xi, wi)
        uxi, invi = np.unique(xi, return_inverse=True)
        uci = np.zeros(len(uxi), dtype=np.int64)
        np.add.at(uci, invi, wi)
        mg_s2.update_batch(uxi, uci)
    assert mg_s.to_bytes() == mg_s2.to_bytes()

    # unit weights == unweighted path
    mg_u1, mg_u2 = MisraGries(k=64), MisraGries(k=64)
    mg_u1.update_batch(items)
    mg_u2.update_batch(items, np.ones(len(items), dtype=np.int64))
    assert mg_u1.to_bytes() == mg_u2.to_bytes()


def test_misra_gries_combine_merge_edges():
    """searchsorted-merge edge cases: batch entirely above / below /
    interleaved with the current state keys; empty state."""
    mg = MisraGries(k=8)
    mg.update_batch(np.array([100, 200, 300], dtype=np.uint64),
                    np.array([5, 6, 7], dtype=np.int64))
    # all below
    mg.update_batch(np.array([1, 2], dtype=np.uint64), np.array([1, 1], dtype=np.int64))
    # all above
    mg.update_batch(np.array([900, 1000], dtype=np.uint64), np.array([2, 2], dtype=np.int64))
    # interleaved incl. exact hits
    mg.update_batch(np.array([2, 150, 200, 950], dtype=np.uint64),
                    np.array([3, 1, 4, 1], dtype=np.int64))
    exact = {100: 5, 200: 10, 300: 7, 1: 1, 2: 4, 900: 2, 1000: 2, 150: 1, 950: 1}
    ks = np.array(sorted(exact), dtype=np.uint64)
    est = mg.point(ks)
    for k, e in zip(ks.tolist(), est.tolist()):
        assert e <= exact[k]
        assert exact[k] - e <= mg.norm // (mg.k + 1) + mg.decrement
    assert np.all(np.diff(mg.items.astype(np.int64)) > 0)  # state stays sorted unique
