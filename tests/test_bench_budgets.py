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


# ---------------------------------------------------------------------------
# Sweep budgets (r4 verdict task #5): the r1-r3 gate-tail regressions all
# happened in NON-headline queries that bench_budgets.json never covered;
# tools/sweep_budgets.json pins every registered query at the gate sf.
# ---------------------------------------------------------------------------


def _load_sweep():
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import sweep

    return sweep


def test_sweep_deliberate_slowdown_turns_red():
    sweep = _load_sweep()
    spec = json.loads((REPO / "tools" / "sweep_budgets.json").read_text())
    name, budget = next(iter(spec["budgets"].items()))
    sf_dir = "/root/testdata/" + spec["sf_dir_basename"]
    ok, _ = sweep.check_sweep_budgets({name: budget * 0.9}, sf_dir)
    bad, _ = sweep.check_sweep_budgets({name: budget * 3.0}, sf_dir)
    assert ok == []
    assert bad == [name]


def test_sweep_budgets_only_bind_at_calibrated_sf():
    sweep = _load_sweep()
    spec = json.loads((REPO / "tools" / "sweep_budgets.json").read_text())
    name, budget = next(iter(spec["budgets"].items()))
    v, u = sweep.check_sweep_budgets(
        {name: budget * 5.0}, "/root/testdata/sf0.001"
    )
    assert v == [] and u == []


def test_sweep_budget_file_covers_every_registered_query():
    spec = json.loads((REPO / "tools" / "sweep_budgets.json").read_text())
    from crocus_spark.queries import REGISTRY, queries

    queries()
    missing = set(REGISTRY) - set(spec["budgets"])
    assert not missing, (
        f"queries without a sweep budget (recalibrate "
        f"tools/gen_sweep_budgets.py): {missing}"
    )
