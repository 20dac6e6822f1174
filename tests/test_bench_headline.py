"""Contract test for bench.py's headline line: the driver parses only
the tail of stdout, so the LAST line must stay under the byte budget
and stay valid JSON at the CURRENT registry size — and keep doing so as
the registry grows (VERDICT r7 noted the r7 headline landed at 1497 B
of the 1500 B cap; this pins the trim behavior instead of luck)."""

from __future__ import annotations

import json

from bench import HEADLINE_BUDGET, headline_line


def _registry_size() -> int:
    # count registered queries WITHOUT building a SparkSession: the plan
    # modules only declare plans at import time
    import __spark_entry__ as entrymod

    return len(entrymod.queries())


def _fake_timings(n: int) -> dict[str, float]:
    # realistic short ids ("q01", "d19", ...) with a heavy tail, plus a
    # -1.0 error sentinel (excluded from the total like the real bench)
    t = {f"x{i:03d}": round(0.31 + (i % 47) * 0.13, 2) for i in range(n - 2)}
    t["d19"] = 14.62
    t["err"] = -1.0
    return t


def _assert_contract(timings: dict[str, float]) -> None:
    line = headline_line(timings, 0.1)
    assert len(line) <= HEADLINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_wall_sec"
    assert parsed["n_queries"] == len(timings)
    expect_total = round(sum(t for t in timings.values() if t >= 0), 2)
    assert parsed["value"] == expect_total
    # the trimmed dict keeps the SLOWEST entries — the actionable ones
    if "queries_truncated_to_slowest" in parsed:
        kept = parsed["queries"]
        assert parsed["queries_truncated_to_slowest"] == len(kept)
        assert "d19" in kept  # slowest query always survives the trim
        floor = min(kept.values())
        dropped = [v for k, v in timings.items() if k not in kept]
        assert all(v <= floor for v in dropped)


def test_headline_fits_at_current_registry_size():
    _assert_contract(_fake_timings(_registry_size()))


def test_headline_fits_with_registry_growth():
    # +20 queries (next rounds), and a far larger sweep for margin
    _assert_contract(_fake_timings(_registry_size() + 20))
    _assert_contract(_fake_timings(1000))


def test_headline_untrimmed_when_small():
    t = {"q01": 1.0, "q02": 2.5}
    parsed = json.loads(headline_line(t, 0.01))
    assert parsed["queries"] == t
    assert "queries_truncated_to_slowest" not in parsed


def test_headline_parses_even_at_tiny_budget():
    # degenerate budget: every query trimmed away, line still valid JSON
    line = headline_line(_fake_timings(500), 0.1, budget=120)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert parsed["n_queries"] == 500
