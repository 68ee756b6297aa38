"""crocus_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``giorgiogandolfi/crocus`` (an ETF-holdings acquisition pipeline, see
SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, extended with the
LLM-data-pipeline operator surface (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Layout:
    session     - SparkSession factory with the engine's config pins
    io          - fixture/table readers + partitioned snapshot sinks
    ingest      - catalog/holdings ingestion pipelines over the snapshot store
    normalize   - locale-string normalization expressions (crocus S6/D2/D3)
    metrics     - observe()-based ingest metrics + corrupt-record quarantine
    functions/  - public scalar/column-expression surface (one import point)
    plans/      - plan inspection (exchange counts, broadcast/pushdown checks)
    operators/  - composed operators (asof/range/fuzzy joins, dedup, ANN, text)
    streaming/  - structured-streaming operators (windows, watermark, state)
    queries/    - named query registry backing __spark_entry__.py
"""

from crocus_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
