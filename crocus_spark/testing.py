"""Oracle-differential test utilities — the engine-side mirror of the
driver's correctness harness (row-count + schema + order-insensitive value
comparison between a Spark DataFrame and a DuckDB SQL result).

Comparison is EXACT on canonicalized cell strings: if a query only matches
its oracle to within float noise, that's a determinism bug in the query (fix
it with the ``_det`` aggregation rules), not a tolerance to paper over.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def canon_cell(v) -> str:
    """Canonical string form of one result cell, type-insensitively enough
    that int64 5 and int32 5 agree but 5 and 5.5 don't."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row (struct cell) ≙ DuckDB dict
        return canon_cell(v.asDict())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _canon_rows(cols, rows) -> tuple[list[str], list[tuple[str, ...]]]:
    """Canonicalize raw cursor rows (DuckDB fetchall keeps DATE as
    datetime.date — matching the driver harness — where fetchdf() would
    coerce it to datetime64 and add a spurious midnight)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(canon_cell(row[i]) for i in order) for row in rows
    ]
    out.sort()
    return sorted(cols), out


def _canon_pandas(v):
    """Canonical form of one cell fetched through the PANDAS path
    (``spark_df.toPandas()`` / DuckDB ``fetchdf``) — the fetch path the
    round driver's value hasher uses. numpy scalars unwrap to Python
    scalars WITHOUT healing the dtype-level coercions pandas applies
    (nullable int → float64, DuckDB HUGEINT → float64): those coercions
    are exactly what this path exists to surface (r2 verdict: the only
    driver hash failures ever recorded were HUGEINT oracle columns that
    the fetchall path could not see). Date/datetime cells are both
    canonicalized to a midnight-bearing ISO form because pandas renders
    DATE as datetime64-at-midnight on one side only — a representational
    artifact, not a value difference (the fetchall path still pins real
    date-vs-timestamp type drift)."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_pandas(x) for x in v.tolist()) + "]"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    return canon_cell(v)


def compare_frames_pandas(spark_df, duck_con, sql: str, max_diffs: int = 5):
    """compare_frames through the driver's pandas/arrow fetch path.

    ``compare_frames`` mirrors the driver on raw cursor values
    (``fetchall``, where DuckDB HUGEINT arrives as Python int); the
    driver's HASHER, however, materializes both sides as dataframes,
    where HUGEINT → float64 while Spark bigint stays int64. Running a
    query through BOTH comparators is the harness-parity guard: a query
    is only driver-safe if the two fetch paths agree."""
    spd = spark_df.toPandas()
    opd = duck_con.execute(sql).fetchdf()

    problems = []
    if len(spd) != len(opd):
        problems.append(f"row count: spark={len(spd)} oracle={len(opd)}")
    scols = sorted(spd.columns)
    ocols = sorted(opd.columns)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
    if not problems:
        srows = sorted(
            tuple(_canon_pandas(v) for v in row)
            for row in spd[scols].itertuples(index=False, name=None)
        )
        orows = sorted(
            tuple(_canon_pandas(v) for v in row)
            for row in opd[ocols].itertuples(index=False, name=None)
        )
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ]
        for i, a, b in diffs[:max_diffs]:
            problems.append(f"row {i}: spark={a} oracle={b}")
        if diffs:
            problems.append(f"... {len(diffs)} differing rows total")
    return (not problems), "; ".join(problems)


def compare_frames(spark_df, duck_con, sql: str, max_diffs: int = 5):
    """Compare a Spark DataFrame against a DuckDB SQL result.

    Returns (ok, report). Mirrors the driver: row count, column-name set,
    and order-insensitive canonical value comparison.
    """
    # collect(), not toPandas(): pandas coerces nullable int columns to
    # float64 (rendering 51 as 51.0) and DATE to datetime64 (adding a
    # spurious midnight) — both would mask or invent type mismatches the
    # driver harness sees on raw values.
    scols_raw = spark_df.columns
    srows_raw = [tuple(r) for r in spark_df.collect()]
    cur = duck_con.execute(sql)
    ocols_raw = [d[0] for d in cur.description]
    orows_raw = cur.fetchall()

    problems = []
    if len(srows_raw) != len(orows_raw):
        problems.append(
            f"row count: spark={len(srows_raw)} oracle={len(orows_raw)}"
        )
    scols, srows = _canon_rows(scols_raw, srows_raw)
    ocols, orows = _canon_rows(ocols_raw, orows_raw)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
    if not problems:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ]
        if diffs:
            for i, a, b in diffs[:max_diffs]:
                problems.append(f"row {i}: spark={a} oracle={b}")
            problems.append(f"... {len(diffs)} differing rows total")
    return (not problems), "; ".join(problems)
