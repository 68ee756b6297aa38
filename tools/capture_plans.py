"""Capture .explain('formatted') for headline queries into plans/<round>/.

Usage: python tools/capture_plans.py before|after [query ...]
Writes plans/<round>/<query>_<tag>.txt for each headline query (or the
named subset); the round directory comes from $CROCUS_PLANS_ROUND
(default r11). Driver-only work — builds the plan, never executes it
(a query fn that eagerly materializes a small intermediate still runs
that part, same as the driver's timed region)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from crocus_spark.queries import REGISTRY, queries  # noqa: E402
from crocus_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    queries()
    names = sys.argv[2:] or sorted(
        n for n, q in REGISTRY.items() if "headline" in q.tags
    )
    out_dir = (
        Path(_REPO) / "plans" / os.environ.get("CROCUS_PLANS_ROUND", "r11")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="crocus-plan-capture")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: {len(plan)} chars")


if __name__ == "__main__":
    main()
