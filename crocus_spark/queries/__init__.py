"""Named query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2B ships as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB oracle
SQL string computing the identical result. The driver runs both at sf0.01 and
compares row-count + schema + order-insensitive value hash — so every query
here is written for *bit-equality* with its oracle (see ``_det.py`` for the
determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry.

    ``oracle`` is ANSI SQL runnable by DuckDB over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). ``oracle=None`` marks a genuinely non-SQL-expressible op —
    the driver then records the weaker rows-only check.
    """

    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_modules()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_modules()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_modules() -> None:
    """Import every query module exactly once (imports populate REGISTRY)."""
    global _LOADED
    if _LOADED:
        return
    from crocus_spark.queries import (  # noqa: F401
        aggregates,
        analytics_q,
        corpus_q,
        crocus_q,
        geo_q,
        graph_q,
        joins,
        joins_advanced,
        llm,
        maintenance_q,
        quality_q,
        relational,
        runtime_q,
        scalars,
        setops,
        sketches_q,
        sources_q,
        sql_surface,
        streaming_q,
        udfs_q,
        windows,
    )

    _LOADED = True
