"""Python Data Source (Spark 4 API): the provider-catalog scraper as a
partition-parallel source.

The reference fetches one product page at a time in a driver-side loop
(``ishares.py:145-148``, with politeness sleeps at :103/:187) — throughput
is structurally <1 product/s and a crash loses the run. Re-expressed as a
``DataSource``, each catalog *page* is an ``InputPartition``: executors
fetch pages concurrently, a failed page retries alone, and everything
downstream is a normal DataFrame. This file is the engine-side plumbing
with a deterministic synthetic page fetcher standing in for HTTP (the
real fetcher would swap into ``_fetch_page`` — clearly marked); the
record derivation is pure modular arithmetic so the same rows are
reproducible in ANY engine, which is what lets the driver's DuckDB
oracle check a *custom source* end-to-end.

Derivation (Knuth multiplicative hashing, exact in 64-bit integers):
    h(id)    = (id * 2654435761) mod 2^32
    price    = (h mod 100000) / 100  (exact same double in any engine)
    currency = (USD, EUR, GBP)[h mod 3]
    weight   = ((h // 7) mod 10000) / 10000
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

PAGE_SIZE = 20
_KNUTH = 2654435761
_M32 = 1 << 32

SCHEMA_DDL = (
    "product_id BIGINT, page INT, isin STRING, currency STRING, "
    "price DOUBLE, weight DOUBLE"
)


def _record(pid: int, page: int) -> tuple:
    h = (pid * _KNUTH) % _M32
    price = (h % 100000) / 100.0
    currency = ("USD", "EUR", "GBP")[h % 3]
    weight = ((h // 7) % 10000) / 10000.0
    isin = f"IE{pid:010d}"
    return (pid, page, isin, currency, price, weight)


def _fetch_page(page: int, n_products: int) -> list[tuple]:
    """One catalog page → records. THE swap point for a real fetcher
    (HTTP GET + parse, the reference's ``get_product_page`` analog); the
    deterministic stand-in keeps the plumbing testable in-container."""
    lo = page * PAGE_SIZE
    hi = min(lo + PAGE_SIZE, n_products)
    return [_record(pid, page) for pid in range(lo, hi)]


class _PagePartition(InputPartition):
    """A contiguous RANGE of catalog pages. One page stays the retry
    unit (a failed fetch re-raises and Spark retries the whole task,
    replaying only this range); ``pages_per_task`` only controls how
    many sequential fetches share one task's scheduling overhead —
    task count tracks catalog size / pages_per_task, not page count."""

    def __init__(self, page_lo: int, page_hi: int, n_products: int):
        self.page_lo = page_lo
        self.page_hi = page_hi  # exclusive
        self.n_products = n_products


class _CatalogReader(DataSourceReader):
    def __init__(self, options):
        self.n_products = int(options.get("n_products", 100))
        self.pages_per_task = max(1, int(options.get("pages_per_task", 1)))
        # Real-HTTP mode: pages served as JSON arrays at
        # {base_url}/page/{p}, fetched executor-side with retry/backoff
        # (sources/http_fetch.py). Absent base_url, the deterministic
        # arithmetic stand-in keeps the plumbing oracle-checkable.
        self.base_url = options.get("base_url")
        self.retries = int(options.get("retries", 3))
        self.politeness_s = float(options.get("politeness_s", 0.0))

    # --- filter pushdown (Spark 4.1 Python Data Source API) ---------
    # Range predicates on product_id narrow the PAGE RANGE the source
    # fetches (product_id // PAGE_SIZE is the page, so id bounds map to
    # page bounds exactly). All filters are RETURNED as unsupported, so
    # Spark re-applies them row-level — pushdown here prunes fetch work
    # (the expensive part: pages are HTTP requests at 100 TB) without
    # ever owning row-level exactness. pushFilters runs at planning
    # time, before partitions().
    _id_lo = 0  # inclusive
    _id_hi = None  # exclusive; None = unbounded

    def pushFilters(self, filters):
        for f in filters:
            if getattr(f, "attribute", None) != ("product_id",):
                continue
            if isinstance(f, GreaterThanOrEqual):
                self._id_lo = max(self._id_lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self._id_lo = max(self._id_lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                hi = int(f.value)
                self._id_hi = hi if self._id_hi is None else min(self._id_hi, hi)
            elif isinstance(f, LessThanOrEqual):
                hi = int(f.value) + 1
                self._id_hi = hi if self._id_hi is None else min(self._id_hi, hi)
            elif isinstance(f, EqualTo):
                self._id_lo = max(self._id_lo, int(f.value))
                hi = int(f.value) + 1
                self._id_hi = hi if self._id_hi is None else min(self._id_hi, hi)
        return filters  # Spark re-applies everything row-level

    def partitions(self):
        n_pages = -(-self.n_products // PAGE_SIZE)
        page_lo = min(self._id_lo // PAGE_SIZE, n_pages)
        id_hi = self.n_products if self._id_hi is None else min(
            self._id_hi, self.n_products
        )
        page_hi = max(page_lo, -(-id_hi // PAGE_SIZE))
        step = self.pages_per_task
        return [
            _PagePartition(lo, min(lo + step, page_hi), self.n_products)
            for lo in range(page_lo, page_hi, step)
        ]

    def read(self, partition):
        for page in range(partition.page_lo, partition.page_hi):
            if self.base_url:
                from crocus_spark.sources.http_fetch import fetch_json_page

                for r in fetch_json_page(
                    self.base_url,
                    page,
                    retries=self.retries,
                    politeness_s=self.politeness_s,
                ):
                    yield (
                        int(r["product_id"]),
                        int(r["page"]),
                        r["isin"],
                        r["currency"],
                        float(r["price"]),
                        float(r["weight"]),
                    )
            else:
                yield from _fetch_page(page, partition.n_products)


class CatalogDataSource(DataSource):
    """``spark.read.format("crocus_catalog").option("n_products", N)``."""

    @classmethod
    def name(cls) -> str:
        return "crocus_catalog"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _CatalogReader(self.options)


def register_catalog_source(spark) -> None:
    """Idempotent registration of the custom format on a session.

    Also enables Python Data Source filter pushdown: the reader
    implements ``pushFilters`` and Spark 4.1 REFUSES to plan a
    pushFilters-implementing reader while the conf is off, so any
    session that uses this source needs it on (planning-time conf,
    safe to set at runtime)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(CatalogDataSource)
    except Exception:
        pass  # already registered on this session


# ---------------------------------------------------------------------------
# Streaming flavor: the scrape *cadence* as a stream. The reference re-runs
# the whole scraper per day and writes a dated file (ishares.py:190-198);
# here each day is one micro-batch from a streaming source, checkpointed by
# offset — a crashed run resumes at the day it died, instead of re-scraping.

STREAM_PAGE = 40  # products per day-batch


def _day_rows(day: int) -> list[tuple]:
    """Deterministic 'one day of catalog': products day*100 .. +STREAM_PAGE
    through the same arithmetic as the batch source."""
    out = []
    for i in range(STREAM_PAGE):
        pid = day * 100 + i
        rec = _record(pid, day)
        out.append((day, pid, rec[3], rec[4]))  # (day, id, currency, price)
    return out


STREAM_SCHEMA_DDL = (
    "day INT, product_id BIGINT, currency STRING, price DOUBLE"
)


class _CatalogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_days = int(options.get("n_days", 3))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict):
        day = int(start["day"])
        if day >= self.n_days:  # caught up: no new data, offset unmoved
            return iter([]), start
        return iter(_day_rows(day)), {"day": day + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after restart: offsets fully determine the rows
        return iter(
            r
            for d in range(int(start["day"]), int(end["day"]))
            for r in _day_rows(d)
        )


class CatalogStreamDataSource(DataSource):
    """``spark.readStream.format("crocus_catalog_stream")`` — bounded to
    ``n_days`` batches; after that the source reports no new data."""

    @classmethod
    def name(cls) -> str:
        return "crocus_catalog_stream"

    def schema(self) -> str:
        return STREAM_SCHEMA_DDL

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CatalogStreamReader(self.options)


def register_catalog_stream_source(spark) -> None:
    try:
        spark.dataSource.register(CatalogStreamDataSource)
    except Exception:
        pass  # already registered on this session


# ---------------------------------------------------------------------------
# Write side: the reference's JSON catalog sink (base_scraper.py:165-170
# rewrites one whole products JSON on the driver) as a partition-parallel
# custom sink with two-phase commit.

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

from crocus_spark.sources.sink_naming import existing_parts, next_part_index


class _JsonCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _CatalogJsonWriter(DataSourceWriter):
    """Each task writes its partition to a temp file and reports it in a
    commit message; the driver's commit() atomically renames the batch
    into place (task retries/speculation leave only orphan temps, which
    abort() removes) — the standard two-phase custom-sink recipe, and the
    executor-parallel answer to the reference's single-threaded
    whole-file rewrite."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crocus_catalog_sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        _os.makedirs(self.path, exist_ok=True)
        tmp = _os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.json")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonCommit(tmp, n)

    def commit(self, messages):
        # base = max(existing part index)+1 with compact numbering over
        # non-None messages (see sink_naming): neither a directory gap
        # nor a None commit message can make os.replace clobber a
        # committed part. Single-writer per batch remains the contract.
        if self.overwrite:
            # honor df.write.mode("overwrite") at the publish point
            for f in existing_parts(self.path, ".json"):
                _os.remove(_os.path.join(self.path, f))
            base = 0
        else:
            base = next_part_index(self.path, ".json")
        for i, m in enumerate([m for m in messages if m is not None]):
            final = _os.path.join(self.path, f"part-{base + i:05d}.json")
            _os.replace(m.tmp_path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class CatalogJsonSink(DataSource):
    """``df.write.format("crocus_catalog_sink").option("path", dir)`` —
    newline-delimited JSON, one file per partition, two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "crocus_catalog_sink"

    def writer(self, schema, overwrite):
        return _CatalogJsonWriter(self.options, overwrite=overwrite)


def register_catalog_sink(spark) -> None:
    try:
        spark.dataSource.register(CatalogJsonSink)
    except Exception:
        pass  # already registered on this session
