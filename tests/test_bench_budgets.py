"""Per-query bench regression pins (r3 verdict task 7): the suite total
hid a single-query 2× regression for two rounds (ann_ivf_topk sat at
~5 s unnoticed). bench_budgets.json checks in a 1.5×-of-BENCH_r03 budget
per headline query; bench.py surfaces violations in its JSON line. These
tests pin the checking logic and keep the budget file in sync with the
headline registry."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    import sys

    sys.path.insert(0, str(REPO))
    import bench

    return bench


def test_deliberate_slowdown_turns_red():
    bench = _load()
    spec = json.loads((REPO / "bench_budgets.json").read_text())
    name, budget = next(iter(spec["budgets"].items()))
    ok_times = {name: budget * 0.9}
    slow_times = {name: budget * 2.0}
    assert bench.check_budgets(ok_times, spec["sf"]) == []
    assert bench.check_budgets(slow_times, spec["sf"]) == [name]


def test_budgets_only_apply_at_calibrated_sf():
    bench = _load()
    spec = json.loads((REPO / "bench_budgets.json").read_text())
    name, budget = next(iter(spec["budgets"].items()))
    assert bench.check_budgets({name: budget * 5}, 0.01) == []


def test_budget_file_covers_every_headline_query():
    spec = json.loads((REPO / "bench_budgets.json").read_text())
    from crocus_spark.queries import REGISTRY, queries

    queries()
    heads = {n for n, q in REGISTRY.items() if "headline" in q.tags}
    missing = heads - set(spec["budgets"])
    assert not missing, f"headline queries without a budget: {missing}"
