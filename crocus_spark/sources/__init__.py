"""Custom sources — the engine's extensible ingestion boundary.

The reference's only "source" is a hand-rolled scraper loop
(``scripts/webscrapers/ishares.py:145-148``: one page fetch per product,
sequential, <1 product/s). Spark's Python Data Source API is where that
logic belongs in a distributed engine: the per-page fetch becomes
``read(partition)``, pages become ``InputPartition``s, and the cluster
fetches them in parallel with restarts/retries handled by the scheduler.
"""

from crocus_spark.sources.avro_source import (
    AvroDataSource,
    AvroLandingStreamSource,
    AvroSink,
    register_avro_sink,
    register_avro_source,
    register_avro_stream_source,
)
from crocus_spark.sources.catalog_source import (
    CatalogDataSource,
    CatalogJsonSink,
    CatalogStreamDataSource,
    register_catalog_sink,
    register_catalog_source,
    register_catalog_stream_source,
)
from crocus_spark.sources.snapshot_batch import (
    SnapshotBatchSource,
    register_snapshot_source,
)
from crocus_spark.sources.snapshot_stream import (
    SnapshotTailSource,
    register_snapshot_tail_source,
)

__all__ = [
    "SnapshotTailSource",
    "SnapshotBatchSource",
    "register_snapshot_tail_source",
    "register_snapshot_source",
    "AvroDataSource",
    "AvroLandingStreamSource",
    "AvroSink",
    "CatalogDataSource",
    "CatalogJsonSink",
    "CatalogStreamDataSource",
    "register_avro_sink",
    "register_avro_source",
    "register_avro_stream_source",
    "register_catalog_sink",
    "register_catalog_source",
    "register_catalog_stream_source",
]
