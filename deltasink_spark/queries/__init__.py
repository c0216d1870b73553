"""Query modules — importing this package registers every op.

One module per SURVEY.md §2 section. Import order is irrelevant; each
module only calls ``registry.query`` at import time.
"""

from deltasink_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    dedup,
    ingest,
    joins,
    llmprep,
    multimodal,
    quality,
    relational,
    scalarfns,
    sketches,
    similarity,
    sources_sinks,
    streaming_ops,
    streamwin,
    text,
    tpch,
    trainprep,
    udfs,
    windows,
)
