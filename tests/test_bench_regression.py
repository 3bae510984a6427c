"""Regression-gate plumbing in bench.py: the previous-round walls must
load from the DRIVER's BENCH_r{N}.json shape ({n, rc, ..., tail,
parsed}) — not just this script's own output — including the round-3
degenerate case where ``parsed`` is null because the stdout tail window
clipped the head of the JSON line. A vacuous baseline made every
"regressions > 1.5x" row trivially empty (VERDICT r03 'What's wrong' #1).
"""

import json

import bench


def _own_line(queries):
    return json.dumps(
        {"metric": "sketch_build_and_query_suite", "value": 1.0, "unit": "sec",
         "queries": queries, "sf": "/root/testdata/sf0.1"}
    )


def test_walls_from_driver_parsed_record(tmp_path):
    q = {"topk_tokens": 1.2, "simhash_pairs": 3.3}
    rec = {"n": 2, "rc": 0, "cpus": 32, "sf": 0.1, "tail": "...",
           "parsed": {"metric": "x", "queries": q}}
    (tmp_path / "BENCH_r2.json").write_text(json.dumps(rec))
    name, walls = bench.previous_query_walls(str(tmp_path))
    assert name == "BENCH_r2.json"
    assert walls == q


def test_walls_from_tail_full_line(tmp_path):
    q = {"topk_tokens": 1.2, "lang_id": 2.0}
    rec = {"n": 2, "rc": 0, "tail": "noise\r" + _own_line(q), "parsed": None}
    (tmp_path / "BENCH_r1.json").write_text(json.dumps(rec))
    _, walls = bench.previous_query_walls(str(tmp_path))
    assert walls == q


def test_walls_from_head_truncated_tail(tmp_path):
    # round-3 shape: the tail window starts MID-queries-dict
    tail = ('.064, "above_threshold_cm": 1.22, "simhash_pairs": 2.503}, '
            '"sf": "/root/testdata/sf0.1", "pages_rows": 200000}')
    rec = {"n": 3, "rc": 0, "tail": tail, "parsed": None}
    (tmp_path / "BENCH_r3.json").write_text(json.dumps(rec))
    _, walls = bench.previous_query_walls(str(tmp_path))
    assert walls["above_threshold_cm"] == 1.22
    assert walls["simhash_pairs"] == 2.503


def test_latest_round_wins(tmp_path):
    for n, w in [(1, 9.0), (10, 5.0), (2, 7.0)]:
        rec = {"parsed": {"queries": {"q": w}}, "tail": ""}
        (tmp_path / f"BENCH_r{n}.json").write_text(json.dumps(rec))
    name, walls = bench.previous_query_walls(str(tmp_path))
    assert name == "BENCH_r10.json"
    assert walls == {"q": 5.0}


def test_regression_flagged_end_to_end(tmp_path):
    """A 2x-slower query MUST land in the regressions row when the
    baseline is a driver-format record (the exact failure mode the
    round-3 gate missed: simhash_pairs 22.2s vs 3.3s went unflagged)."""
    rec = {"n": 2, "rc": 0, "parsed": {"queries": {"simhash_pairs": 3.3, "lang_id": 2.0}},
           "tail": ""}
    (tmp_path / "BENCH_r2.json").write_text(json.dumps(rec))
    _, prev = bench.previous_query_walls(str(tmp_path))
    now = {"simhash_pairs": 22.2, "lang_id": 1.9}
    reg = bench.compute_regressions(now, prev)
    assert set(reg) == {"simhash_pairs"}
    assert reg["simhash_pairs"]["prev"] == 3.3
    assert reg["simhash_pairs"]["ratio"] == 6.73


def test_no_false_regressions():
    assert bench.compute_regressions({"a": 1.0}, {"a": 0.9}) == {}
    assert bench.compute_regressions({"a": 1.0}, {}) == {}
    assert bench.compute_regressions({"a": 1.0}, {"a": -1.0}) == {}
