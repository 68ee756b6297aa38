"""Benchmark harness — times the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line for the round driver (recorded as BENCH_r{N}.json).

Measurement rules:
- one warm SparkSession (JVM/codegen warm-up run first, untimed);
- each query executes end-to-end into the ``noop`` sink — full physical
  plan runs (scan → shuffle → agg), nothing is collected to the driver, so
  the number measures the engine, not Arrow serialization;
- wall time per query = MIN over three independent passes: the minimum is
  the standard low-noise estimator on a shared box (it strips scheduler
  contention and first-pass codegen/JIT warm-up, which are host noise,
  not engine cost).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from crocus_spark.queries import REGISTRY, queries  # noqa: E402
from crocus_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. "sf0.1"
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def _execute(df) -> None:
    """Force full execution without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    queries()  # populate REGISTRY
    heads = sorted(n for n, q in REGISTRY.items() if "headline" in q.tags)

    spark = get_spark(app_name="crocus-bench")
    # warm-up: JVM, codegen, parquet footers — untimed
    _execute(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))

    times: dict[str, float] = {}
    for _pass in range(3):
        for name in heads:
            t0 = time.perf_counter()
            _execute(REGISTRY[name].fn(spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, dt), dt)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
