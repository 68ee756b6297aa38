"""Plan inspection utilities — the engine's "is this the plan I'd want at
100 TB?" toolkit (SURVEY.md §4).

The engine deliberately ships no custom optimizer (§4.2: configure
Catalyst, don't rebuild it); what it ships instead is the means to VERIFY
Catalyst produced the scale-correct plan: formatted-plan access plus
predicates for the properties that matter (broadcast vs shuffle joins,
pushdown reaching the scan, partial aggregation, exchange counts).
`tests/test_plans.py` pins these properties for the headline queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain() text as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the physical plan."""
    return len(re.findall(r"\(\d+\) Exchange", explain_str(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def uses_shuffle_join(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one predicate reached the parquet scan."""
    return bool(re.search(r"PushedFilters: \[[^\]]", explain_str(df)))


def has_partition_filters(df: DataFrame) -> bool:
    """True when partition pruning applies to at least one scan."""
    return bool(re.search(r"PartitionFilters: \[[^\]]", explain_str(df)))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when an aggregate runs map-side (partial) before its exchange."""
    plan = explain_str(df)
    return plan.count("HashAggregate") >= 2 and "partial" in plan.lower()


__all__ = [
    "count_exchanges",
    "explain_str",
    "has_partial_aggregation",
    "has_partition_filters",
    "has_pushed_filters",
    "uses_broadcast_join",
    "uses_shuffle_join",
]
