"""Per-query bench budget guard: every benched query must stay under a
fixed wall-clock budget at sf0.1 on local[32], so a plan regression fails
CI instead of waiting for a judge diff. Reads the committed
BENCH_DETAIL.json written by bench.py (VERDICT r03 item 7)."""

from __future__ import annotations

import json
import os

import pytest

_DETAIL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_DETAIL.json",
)

#: seconds per query at sf0.1 / local[32]; the heaviest legitimate entry
#: (dedup_clusters, pair generation + propagation) runs ~6-8 s. 15 s
#: leaves shared-host noise headroom — entries over 3 s are timed ONCE
#: per bench run and single runs swing 2-4x on this VM — while still
#: catching an accidental O(n^2) plan (those land at 30 s+).
PER_QUERY_BUDGET_SEC = 15.0


def _detail():
    if not os.path.exists(_DETAIL):
        pytest.skip("BENCH_DETAIL.json not present (bench not yet run)")
    with open(_DETAIL) as fh:
        return json.load(fh)


def test_every_benched_query_within_budget():
    d = _detail()
    over = {
        name: sec
        for name, sec in d["queries"].items()
        if sec > PER_QUERY_BUDGET_SEC
    }
    assert not over, f"queries over {PER_QUERY_BUDGET_SEC}s at sf{d['sf']}: {over}"


def test_bench_detail_covers_the_suite():
    d = _detail()
    assert d["n_queries"] == len(d["queries"])
    assert d["n_queries"] >= 90, "bench suite shrank"
