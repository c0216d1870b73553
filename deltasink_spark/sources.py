"""Sources (SURVEY.md §2.1): batch scans + streaming sources.

Reference parity: the Kafka record stream is the reference's entire
input surface ("Stream DeltaLake tables from Kafka",
/root/reference/README.md:2); the reference snapshot ships no code, so
the record schema below is the public Structured Streaming Kafka
source contract any implementation of that line consumes.

The Kafka source is a thin config wrapper — what matters is the fixed
record schema (key/value/topic/partition/offset/timestamp/headers) that
the ingest pipeline (streaming/pipeline.py) consumes; rate/file sources
produce compatible frames for broker-less tests, exercising the same
incremental engine (Structured Streaming planner/state/commit path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed Structured Streaming Kafka source schema (public contract).
KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def scan_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).csv(path, header=header)


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded Kafka record stream. `maxOffsetsPerTrigger` bounds
    per-batch intake (backpressure); offsets are checkpoint-tracked by
    the engine for exactly-once recovery."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


class _MemoryRowsReader:
    """SimpleDataSourceStreamReader emitting a fixed number of
    deterministic batches — the broker-less MemoryStream stand-in,
    implemented on the Spark 4 Python Data Source API so it runs the
    real incremental engine (offset tracking, replay via
    readBetweenOffsets)."""

    ROWS_PER_BATCH = 10

    def __init__(self, n_batches: int = 3):
        self.n_batches = n_batches

    def initialOffset(self):
        return {"batch": 0}

    def _rows(self, b: int):
        return [(b * self.ROWS_PER_BATCH + i, f"m{b}_{i}") for i in range(self.ROWS_PER_BATCH)]

    def read(self, start):
        b = start["batch"]
        if b >= self.n_batches:
            return (iter(()), {"batch": b})
        return (iter(self._rows(b)), {"batch": b + 1})

    def readBetweenOffsets(self, start, end):
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(self._rows(b))
        return iter(rows)


def register_memory_rows_source(spark: SparkSession) -> str:
    """Register the in-memory streaming source; returns the format name."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(_MemoryRowsReader, SimpleDataSourceStreamReader):
        pass

    class MemoryRowsSource(DataSource):
        @classmethod
        def name(cls):
            return "memory_rows"

        def schema(self):
            return "id bigint, payload string"

        def simpleStreamReader(self, schema):
            return _Reader(int(self.options.get("nbatches", 3)))

    spark.dataSource.register(MemoryRowsSource)
    return "memory_rows"


def rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Test stand-in stream: (timestamp, value) rows at a fixed rate."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def rate_as_kafka(spark: SparkSession, rows_per_second: int = 1000, topic: str = "t") -> DataFrame:
    """Rate stream reshaped to the Kafka record schema so the full
    ingest pipeline runs without a broker."""
    r = rate_source(spark, rows_per_second)
    payload = F.to_json(F.struct(F.col("value").alias("k")))
    return r.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(4)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def file_stream_source(spark: SparkSession, path: str, schema: str, fmt: str = "parquet") -> DataFrame:
    """File-discovery stream (each new file = one micro-batch input)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events fixture as a bounded stream (batch stand-in for the
    Kafka topic). The file source requires a directory, so the fixture
    file is staged via symlink.

    The declared ``ts`` schema must match the fixture's physical
    encoding (the generator has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS)); a streaming reader can't introspect like
    tables._load_events, so the parquet footer is checked once at plan
    time. Declaring bigint over the micros fixture would silently read
    timestamps 1000x too small — the bug class the footer check
    prevents."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    stage = os.path.join(tempfile.gettempdir(), "ds_stream_stage", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    ts_phys = str(pq.ParquetFile(link).schema_arrow.field("ts").type)
    nanos = ts_phys in ("timestamp[ns]", "int64")
    ts_decl = "ts bigint" if nanos else "ts timestamp"
    schema = (
        f"event_id bigint, {ts_decl}, user_id bigint, "
        "event_type string, value double, props string"
    )
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(stage)
    if nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def events_stream_batched(spark: SparkSession, sf_dir: str, n_batches: int = 4) -> DataFrame:
    """The events fixture as a stream that arrives in ``n_batches``
    event-time-ordered micro-batches (one file per trigger).

    Why this exists: an append-mode windowed/session aggregation emits
    a group only when the watermark passes its end, and the watermark
    only advances BETWEEN micro-batches. A single-file fixture drains
    in one batch, so nothing is ever sealed and the query yields zero
    rows — this staging is how the bounded fixture exercises the real
    multi-trigger emission path. Files are ts-range partitions with
    ascending modification times, which is the order FileStreamSource
    discovers them in."""
    import os
    import tempfile

    from deltasink_spark.tables import load as load_table

    stage = os.path.join(
        tempfile.gettempdir(),
        "ds_stream_stage_split",
        f"{sf_dir.strip('/').replace('/', '_')}_{n_batches}",
    )
    done = os.path.join(stage, "_STAGED")
    # The stage holds COPIES, so it must be invalidated when the
    # fixture regenerates (the driver does this between rounds — the
    # r3 bench crash was exactly a stale-encoding assumption). The
    # marker records the source's (mtime, size) fingerprint; any
    # mismatch rebuilds.
    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)
    fingerprint = f"{st.st_mtime_ns}:{st.st_size}"
    stale = True
    if os.path.exists(done):
        with open(done) as fh:
            stale = fh.read() != fingerprint
    if stale:
        import shutil

        import pyarrow.parquet as _pq

        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        (
            load_table(spark, sf_dir, "events")
            .repartitionByRange(n_batches, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(stage)
        )
        parts = sorted(
            f for f in os.listdir(stage) if f.startswith("part-") and f.endswith(".parquet")
        )
        counts = [
            _pq.ParquetFile(os.path.join(stage, f)).metadata.num_rows for f in parts
        ]
        total = sum(counts)
        # Consumers' oracles (stream_progress_metrics) count the
        # non-empty slices, so the stage GUARANTEES min(n_batches,
        # rows) of them. repartitionByRange picks boundaries by
        # sampling — a tiny or ts-skewed fixture can leave a range
        # empty; fall back to an exact row_number split (global sort is
        # fine: staging runs once per fixture fingerprint).
        want = min(n_batches, total)
        if sum(1 for c in counts if c > 0) != want and total > 0:
            from pyspark.sql import Window as _W
            from pyspark.sql import functions as F

            for f in parts:
                os.remove(os.path.join(stage, f))
            ranked = load_table(spark, sf_dir, "events").withColumn(
                "_rn", F.row_number().over(_W.orderBy("ts", "event_id"))
            )
            parts = []
            for k in range(want):
                sl = ranked.filter(
                    F.expr(f"((_rn - 1) * {want}) div {total} = {k}")
                )
                tmp = os.path.join(stage, f"_w{k}")
                sl.drop("_rn").orderBy("ts").coalesce(1).write.mode(
                    "overwrite"
                ).parquet(tmp)
                src_f = next(
                    x
                    for x in os.listdir(tmp)
                    if x.startswith("part-") and x.endswith(".parquet")
                )
                dst = f"part-{k:05d}-exact.parquet"
                os.rename(os.path.join(tmp, src_f), os.path.join(stage, dst))
                shutil.rmtree(tmp)
                parts.append(dst)
        else:
            for f, c in zip(parts, counts):
                if c == 0:
                    os.remove(os.path.join(stage, f))
            parts = [f for f, c in zip(parts, counts) if c > 0]
        # part-0000k order == ascending ts ranges; make discovery order
        # (modification time) match.
        if parts:
            base = int(os.path.getmtime(os.path.join(stage, parts[0])))
            for i, f in enumerate(parts):
                os.utime(os.path.join(stage, f), (base + i, base + i))
        with open(done, "w") as fh:
            fh.write(fingerprint)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )


LATE_DELAY_US = 600_000_000  # 10 minutes, the late-policy delay
LATE_MOD = 97  # deterministic withheld-row selector (event_id % 97 == 0)


def events_stream_with_late(spark: SparkSession, sf_dir: str):
    """The events fixture as a 4-batch stream with DETERMINISTIC late
    arrivals: rows are split into quartile files by explicit epoch-us
    cuts (cut_k = lo + (hi-lo)*k//4 — explicit, so an oracle can
    recompute the batch assignment in SQL, unlike
    events_stream_batched's sampled repartitionByRange), except that
    rows with event_id % LATE_MOD == 0 falling in the first two
    quartiles are WITHHELD from their natural batch and delivered in
    the last one — the fetch-retry/consumer-rebalance straggler
    pattern. By construction only those rows can be behind the
    watermark on arrival (natural batches are ts-ordered), so the
    late set is exactly SQL-derivable. Returns the stream (one file
    per trigger, discovery order = ascending mtimes)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from deltasink_spark.tables import load as load_table

    stage = os.path.join(
        tempfile.gettempdir(),
        "ds_stream_stage_late",
        sf_dir.strip("/").replace("/", "_"),
    )
    done = os.path.join(stage, "_STAGED")
    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)
    fingerprint = f"{st.st_mtime_ns}:{st.st_size}"
    stale = True
    if os.path.exists(done):
        with open(done) as fh:
            stale = fh.read() != fingerprint
    if stale:
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        ev = load_table(spark, sf_dir, "events")
        lo, hi = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).first()
        if lo is None:  # empty corpus: four empty slices, zero cuts
            lo = hi = 0
        cuts = [lo + ((hi - lo) * k) // 4 for k in (1, 2, 3)]
        eu = F.unix_micros(F.col("ts"))
        withheld = (F.col("event_id") % LATE_MOD == 0) & (eu < F.lit(cuts[1]))
        slices = [
            ev.filter(~withheld & (eu < F.lit(cuts[0]))),
            ev.filter(~withheld & (eu >= F.lit(cuts[0])) & (eu < F.lit(cuts[1]))),
            ev.filter((eu >= F.lit(cuts[1])) & (eu < F.lit(cuts[2]))),
            ev.filter((eu >= F.lit(cuts[2])) | withheld),
        ]
        base_t = None
        for i, sl in enumerate(slices):
            part = os.path.join(stage, f"w{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            f = next(
                (
                    x for x in os.listdir(part)
                    if x.startswith("part-") and x.endswith(".parquet")
                ),
                None,
            )
            if f is None:  # empty slice wrote no data file: skip it
                shutil.rmtree(part)
                continue
            dst = os.path.join(stage, f"batch_{i}.parquet")
            os.rename(os.path.join(part, f), dst)
            shutil.rmtree(part)
            if base_t is None:
                base_t = int(os.path.getmtime(dst))
            os.utime(dst, (base_t + i, base_t + i))
        with open(done, "w") as fh:
            fh.write(fingerprint)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
