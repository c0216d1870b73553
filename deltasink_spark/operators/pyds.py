"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The extension point a connector author uses when no JVM DataSource V2
exists for their system: a pure-Python source that still gets real
engine integration — one InputPartition per parquet row group (so the
scan parallelizes across executors like a native file scan), Arrow
RecordBatch output (columnar transfer, no per-row Python), and filter
pushdown via ``DataSourceReader.pushFilters`` (accepted filters are
applied inside the source with pyarrow.compute; everything else is
returned to Spark to evaluate).

This file demonstrates the full surface against the fixture parquet
(the backing store stands in for any external system with range-served
reads: a REST cursor API, a scan-ranged KV store, a feature service).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThanOrEqual,
    InputPartition,
)


class _RowGroup(InputPartition):
    def __init__(self, path: str, index: int) -> None:
        self.path = path
        self.index = index


class _FixtureDocsReader(DataSourceReader):
    _COLS = ["doc_id", "lang", "n_chars"]

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.min_doc_id: int | None = None

    def pushFilters(self, filters):
        """Accept `doc_id >= N`; everything else goes back to Spark.
        Accepted filters MUST be enforced in read() — Spark will not
        re-check them."""
        unsupported = []
        for f in filters:
            if (
                isinstance(f, GreaterThanOrEqual)
                and tuple(f.attribute) == ("doc_id",)
                and isinstance(f.value, int)
            ):
                self.min_doc_id = f.value
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroup(self.path, i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(
            partition.index, columns=self._COLS
        )
        if self.min_doc_id is not None:
            table = table.filter(pc.greater_equal(table["doc_id"], self.min_doc_id))
        yield from table.to_batches()


class FixtureDocsDataSource(DataSource):
    """``spark.read.format("fixture_docs").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "fixture_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema):
        return _FixtureDocsReader(self.options)
