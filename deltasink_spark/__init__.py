"""deltasink_spark — a PySpark-native analytics + streaming-ingest engine.

Re-expresses the capability surface of the reference project
``vbogretsov/deltasink`` ("Stream DeltaLake tables from Kafka",
/root/reference/README.md:2) Spark-first: Structured Streaming for the
Kafka->Delta ingest path, the DataFrame/SQL API (Catalyst + Tungsten)
for the batch analytics surface, and pure-DataFrame algorithms (MinHash
LSH, cosine top-k, sessionization) for the LLM-data-pipeline operators.

Layout:
    session.py    SparkSession factory tuned for OLAP (AQE, UTC, Arrow)
    tables.py     fixture table loaders / temp-view registration
    registry.py   op-id -> (query callable, oracle SQL) registry
    queries/      one module per SURVEY.md §2 section; registers ops
    operators/    reusable operator implementations (as-of join, topk,
                  minhash, vector math, text pipeline)
    sources.py    batch + streaming sources (parquet/json/csv/kafka/rate)
    sinks.py      batch + streaming sinks (parquet, dead-letter,
                  exactly-once ledger emulating the Delta txn protocol)
    streaming/    watermark/window/stateful/exactly-once pipelines
"""

from deltasink_spark.registry import ORACLES, QUERIES  # noqa: F401

__version__ = "0.1.0"
