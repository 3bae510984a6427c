"""Hierarchical heavy-hitter fixtures ported (in semantics, not code)
from the reference suites tests/test_hh_min_sketch.c and
test_hh_ktree.c, plus dyadic range-count accuracy."""

import numpy as np
import pytest

from heavy_hitters_spark.core import SeedStream, Sketch
from heavy_hitters_spark.hh import ConstSketchHH, DyadicHH


@pytest.mark.parametrize("gran", [1, 4, 8])
@pytest.mark.parametrize("sketch_type", ["count_min", "count_sketch"])
def test_micro_weighted_fixture(micro_pairs, gran, sketch_type):
    """{2,3,8,327} expected at phi=.05, m=2^9 (test_hh_min_sketch.c:14-66)."""
    items, w = micro_pairs
    hh = DyadicHH(
        phi=0.05, epsilon=0.01, delta=0.2, m=(1 << 9) - 1, gran=gran,
        sketch_type=sketch_type, seed_stream=SeedStream(1, 2),
    )
    hh.update_batch(items, w)
    assert sorted(i for i, _ in hh.query()) == [2, 3, 8, 327]


def _planted_stream(rng, m, n, planted, share=0.10):
    draws = rng.integers(0, m + 1, n, dtype=np.uint64)
    sel = rng.random(n)
    lo = 1.0 - share * len(planted)
    for j, p in enumerate(planted):
        mask = (sel >= lo + j * share) & (sel < lo + (j + 1) * share)
        draws[mask] = p
    return draws


def test_planted_hitters(rng):
    """7 planted 10%-mass items recovered exactly at phi=.05
    (test_hh_min_sketch.c:68-131, scaled down)."""
    m = (1 << 20) - 1
    planted = np.array([3, 134, 2345, 38474, 374298, 374299, 1000000], dtype=np.uint64)
    draws = _planted_stream(rng, m, 1 << 20, planted)
    hh = DyadicHH(phi=0.05, epsilon=0.005, delta=0.1, m=m, gran=8,
                  seed_stream=SeedStream(1, 2))
    hh.update_batch(draws)
    assert sorted(i for i, _ in hh.query()) == sorted(int(p) for p in planted)


def test_near_threshold(rng):
    """Items just below phi-eps must NOT be reported; items at/above phi
    must be (test_hh_min_sketch.c:133-203)."""
    m = (1 << 16) - 1
    n = 1 << 20
    phi, eps = 0.05, 1 / 128
    # planted shares: one clearly above phi, one in the allowed gap is
    # not asserted either way, one clearly below phi-eps
    above, below = 777, 888
    draws = rng.integers(0, m + 1, n, dtype=np.uint64)
    sel = rng.random(n)
    draws[sel < 0.06] = above          # 6% > phi
    draws[(sel >= 0.9) & (sel < 0.93)] = below  # 3% < phi - eps
    hh = DyadicHH(phi=phi, epsilon=eps, delta=0.05, m=m, gran=4,
                  seed_stream=SeedStream(1, 2))
    hh.update_batch(draws)
    got = {i for i, _ in hh.query()}
    assert above in got
    assert below not in got


def test_range_count(rng):
    m = (1 << 16) - 1
    draws = rng.integers(0, m + 1, 1 << 19, dtype=np.uint64)
    hh = DyadicHH(phi=0.01, epsilon=0.001, delta=0.05, m=m, gran=4,
                  seed_stream=SeedStream(1, 2))
    hh.update_batch(draws)
    for lo, hi in [(0, 999), (5000, 20000), (0, m), (12345, 12345)]:
        exact = int(((draws >= lo) & (draws <= hi)).sum())
        est = hh.range_count(lo, hi)
        assert abs(est - exact) <= 0.01 * hh.norm + 1e-9, (lo, hi, est, exact)


def test_hh_point_and_serde(micro_pairs):
    items, w = micro_pairs
    hh = DyadicHH(phi=0.05, epsilon=0.01, delta=0.2, m=(1 << 9) - 1, gran=1,
                  seed_stream=SeedStream(1, 2))
    hh.update_batch(items, w)
    r = Sketch.from_bytes(hh.to_bytes())
    assert np.array_equal(r.point(items), hh.point(items))
    assert sorted(i for i, _ in r.query()) == [2, 3, 8, 327]
    assert r.norm == hh.norm == int(w.sum())


@pytest.mark.parametrize("gran", [1, 4, 8])
def test_const_sketch_micro_fixture(micro_pairs, gran):
    """hh_const_sketch variant on the same reference fixture
    (tests/test_hh_const_sketch.c follows test_hh_min_sketch.c)."""
    items, w = micro_pairs
    hh = ConstSketchHH(phi=0.05, epsilon=0.01, delta=0.2, m=(1 << 9) - 1,
                       gran=gran, seed_stream=SeedStream(1, 2))
    hh.update_batch(items, w)
    assert sorted(i for i, _ in hh.query()) == [2, 3, 8, 327]


def test_const_sketch_planted_and_merge(rng):
    m = (1 << 20) - 1
    planted = np.array([3, 134, 2345, 38474, 374298, 374299, 1000000], dtype=np.uint64)
    draws = _planted_stream(rng, m, 1 << 20, planted)
    bulk = ConstSketchHH(phi=0.05, epsilon=0.005, delta=0.1, m=m, gran=8,
                         seed_stream=SeedStream(1, 2))
    bulk.update_batch(draws)
    assert sorted(i for i, _ in bulk.query()) == sorted(int(p) for p in planted)
    # linear: permuted-partition merge byte-identical
    parts = [draws[i::4] for i in range(4)]
    states = []
    for p in parts[::-1]:
        s = ConstSketchHH(phi=0.05, epsilon=0.005, delta=0.1, m=m, gran=8,
                          seed_stream=SeedStream(1, 2))
        s.update_batch(p)
        states.append(s)
    acc = states[0]
    for s in states[1:]:
        acc = acc.merge(s)
    assert acc.to_bytes() == bulk.to_bytes()
    r = Sketch.from_bytes(bulk.to_bytes())
    assert sorted(r.query()) == sorted(bulk.query())


def test_phi_guard():
    with pytest.raises(AssertionError):
        DyadicHH(phi=0.01, epsilon=0.02, delta=0.1)  # phi must exceed eps


def test_dyadic_width_depth_override():
    """Global width/depth override (the reference's -w/-h flags,
    applied to every level sketch) must produce level sketches with
    exactly those dims and still answer queries correctly."""
    import numpy as np

    from heavy_hitters_spark.core import SeedStream
    from heavy_hitters_spark.hh import DyadicHH

    hh = DyadicHH(
        phi=0.01, epsilon=0.005, delta=0.05, m=(1 << 32) - 1, gran=8,
        sketch_type="count_sketch", seed_stream=SeedStream(7, 8),
        width=1 << 12, depth=5,
    )
    for kind, s in hh.levels:
        if kind == "sketch":
            assert (s.w, s.d) == (1 << 12, 5)
    rng = np.random.default_rng(3)
    items = np.concatenate([
        rng.integers(0, 1 << 20, 3000).astype(np.uint64),
        np.full(500, 42, dtype=np.uint64),
    ])
    hh.update_batch(items)
    hits = dict(hh.query())
    assert 42 in hits
    # serde roundtrip preserves the overridden dims
    hh2 = type(hh).from_bytes(hh.to_bytes())
    assert dict(hh2.query()) == hits
