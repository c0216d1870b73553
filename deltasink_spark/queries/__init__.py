"""Query modules — importing this package registers every op.

One module per SURVEY.md §2 section. Import order is irrelevant AMONG
the imports below, with one documented exception: similarity.py reads
``registry.ORACLES["text_bm25"]`` at import time (rank_fusion_rrf
embeds the component retriever's oracle verbatim so the fused oracle
cannot drift) and therefore imports trainprep itself first — do not
remove that import or add a trainprep -> similarity import (cycle).
"""

from deltasink_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    dedup,
    delta_log_ops,
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
