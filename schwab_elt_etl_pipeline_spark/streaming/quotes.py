"""Streaming tick ingestion (SURVEY T1-T3, T8).

Reference behavior re-expressed on Structured Streaming:

- T1 micro-batching: the reference buffers 1000 records per flush
  (tools/parquet_writer.py:14,26-27); here ``trigger(processingTime=...)``
  micro-batches — and the sink appends files instead of the reference's
  read-concat-rewrite of the daily file (O(n²)/day, BASELINE.md).
- T2 daily rotation: one file per day becomes ``partitionBy("date")``.
- T3 latest-per-key with TTL: Redis ``SET key val EX 600``
  (tools/redis_cache.py:19-27) becomes a latest-per-key aggregation in
  update mode; TTL is a watermark-age filter at read time.
- T8 dedup: batch-side idempotence stays anti-join based (operators.merge);
  streaming dedup uses ``dropDuplicates`` within the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM


def parse_stream_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a message-transport stream into ``QUOTES_STREAM`` rows.

    ``raw`` is anything that delivers ONE JSON tick message per record in a
    string/binary ``value`` column — exactly the shape Kafka
    (``CAST(value AS STRING)``), the socket source, and newline-delimited
    text files all produce. Mirrors the reference's websocket LEVELONE
    handler (services/schwab_stream.py:204-340): each message carries the
    symbol plus numbered Schwab fields; fields absent from a message stay
    NULL (same contract as the parquet path — ``parse_quotes`` downstream is
    identical). Records that aren't valid JSON or lack a symbol are dropped
    (``from_json`` yields NULL on malformed input — the poison-pill guard a
    transport stream needs)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), QUOTES_STREAM).alias("q")
    ).select("q.*")
    return parsed.filter(F.col("symbol").isNotNull())


def read_quote_stream(
    spark: SparkSession,
    source_dir: str | None = None,
    max_files_per_trigger: int = 10,
    fmt: str = "files",
    options: dict | None = None,
) -> DataFrame:
    """Tick stream behind a swappable transport (SURVEY S3).

    - ``files`` (default): parquet directory stream — the harness/test feed.
    - ``json-files``: newline-delimited JSON text files — byte-compatible
      with what a socket feed delivers, so tests exercise the exact
      message-decode path production uses.
    - ``socket``: ``format("socket")`` (built-in) + JSON decode; pass
      ``options={"host": ..., "port": ...}``.
    - ``kafka``: ``format("kafka")`` + JSON decode of the record value; pass
      Kafka options (``kafka.bootstrap.servers``, ``subscribe``, ...).
      Requires the spark-sql-kafka connector package on the classpath.

    Every transport lands in the same ``QUOTES_STREAM`` schema, so the whole
    downstream Silver/Gold plan is transport-agnostic.
    """
    opts = options or {}
    if fmt == "files":
        return (
            spark.readStream.schema(QUOTES_STREAM)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
    if fmt == "json-files":
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(source_dir)
        )
        return parse_stream_json(raw)
    if fmt == "socket":
        raw = spark.readStream.format("socket").options(**opts).load()
        return parse_stream_json(raw)
    if fmt == "kafka":
        raw = spark.readStream.format("kafka").options(**opts).load()
        return parse_stream_json(raw)
    raise ValueError(f"unknown quote-stream format: {fmt!r}")


def write_bronze_stream(
    quotes: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Bronze sink: append-mode parquet partitioned by event date (T1/T2)."""
    with_date = quotes.withColumn(
        "date", F.to_date(F.timestamp_millis(F.col("received_at")))
    )
    writer = (
        with_date.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(quotes: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T8 streaming dedup: drop duplicate ticks keyed (symbol, quote-time)
    within a watermark.

    The reference dedups against the ENTIRE target at insert time (J9) —
    correct for batch, unbounded state for a stream. The streaming form bounds
    state with an event-time watermark via ``dropDuplicatesWithinWatermark``:
    duplicates arriving within ``watermark`` of the max seen event time are
    dropped AND their state is evicted once the watermark passes; anything
    later falls through to the batch anti-join downstream (foreachBatch →
    insert_new), which stays the source of truth for idempotence. (Plain
    ``dropDuplicates`` without the event-time column in the key would keep
    one state entry per key forever and swallow late replays, contradicting
    this contract.)

    The dedup key is (symbol, quote-time) for options (field 38), (symbol,
    trade-time) for equities (field 35 — the ``$SPX`` underlying rows carry
    NO field 38, and null keys compare equal in dropDuplicates, so keying on
    38 alone would collapse every underlying tick into the first one).
    ``received_at`` backstops records carrying neither.
    """
    with_event_time = quotes.withColumn(
        "event_time", F.timestamp_millis(F.col("received_at"))
    ).withColumn(
        "_dedup_ms", F.coalesce(F.col("38"), F.col("35"), F.col("received_at"))
    )
    return (
        with_event_time.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["symbol", "_dedup_ms"])
        .drop("_dedup_ms")
    )


def latest_per_key(quotes: DataFrame, ttl_seconds: int = 600) -> DataFrame:
    """T3: latest quote per symbol (the Redis-cache view).

    On a stream, run with ``outputMode("update")`` + ``foreachBatch`` to a KV
    sink; on a batch DataFrame it is the same expression. TTL: rows older than
    ``ttl_seconds`` relative to the max received_at are expired, mirroring
    Redis ``EX 600`` (config.yaml:64).
    """
    latest = quotes.groupBy("symbol").agg(
        F.max_by(F.struct("received_at", "37", "38", "3", "35"), "received_at").alias("q"),
    )
    # global horizon over the already-aggregated (small) symbol universe;
    # q.received_at IS the per-symbol max (max_by its own ordering key), so
    # expanding q.* yields exactly one received_at column — a separate
    # aggregate alias would duplicate the name and break any downstream
    # reference to it (AMBIGUOUS_REFERENCE).
    horizon = F.max(F.col("q.received_at")).over(Window.partitionBy())
    return (
        latest.withColumn("_horizon", horizon)
        .filter((F.col("_horizon") - F.col("q.received_at")) / 1000 <= ttl_seconds)
        .drop("_horizon")
        .select("symbol", "q.*")
    )


def windowed_candles(
    quotes: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window OHLC candles from the tick stream.

    The reference ingests pre-built candles over REST
    (tools/schwab.py:870-934); a streaming engine can derive them from the
    tick stream directly: event-time tumbling windows with a watermark, so
    state is bounded and ticks later than ``watermark`` are dropped (the
    batch re-import path remains the source of truth for stragglers, same
    contract as :func:`dedup_stream`). Note Spark's two-watermark semantics
    (SPARK-40925): late ticks are filtered against the PREVIOUS batch's
    watermark, so the drop takes effect one micro-batch after the watermark
    advances past them.

    Works identically on a batch DataFrame (window() is the same expression);
    on a stream use append mode — windows emit once finalized.

    Scale: per-window partial aggregation happens map-side; state per key is
    one (open-by, high, low, close-by, count) tuple — no per-tick retention.
    """
    ticks = quotes.filter(F.col("37").isNotNull()).select(
        "symbol",
        F.timestamp_millis(F.col("38")).alias("event_time"),
        F.col("37").alias("mark"),
    )
    # slide < window -> hopping (overlapping) windows: each tick lands in
    # window/slide panes; state cost scales by the same factor, watermark
    # eviction is unchanged (a pane closes when the watermark passes its end).
    return (
        ticks.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide or window).alias("w"), "symbol")
        .agg(
            F.min_by("mark", "event_time").alias("O"),
            F.max("mark").alias("H"),
            F.min("mark").alias("L"),
            F.max_by("mark", "event_time").alias("C"),
            F.count(F.lit(1)).alias("V"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            "O", "H", "L", "C", "V",
        )
    )


def tick_sessions(
    quotes: DataFrame,
    gap: str = "2 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-symbol activity sessions: consecutive ticks closer than ``gap``
    merge into one session (native ``session_window`` — dynamic-length
    windows, unlike the fixed panes of :func:`windowed_candles`).

    Emits (symbol, session_start, session_end, n_ticks, first/last mark)
    once the watermark passes a session's close — the burst/lull structure a
    liquidity monitor consumes. State per open session is one small tuple;
    merging adjacent sessions on late-but-in-watermark ticks is handled by
    the operator (sessions are NOT finalized until the gap is watermark-aged).
    Works identically on batch DataFrames (same expression, no watermark
    needed there).
    """
    ticks = quotes.filter(F.col("37").isNotNull()).select(
        "symbol",
        F.timestamp_millis(F.col("38")).alias("event_time"),
        F.col("37").alias("mark"),
    )
    if ticks.isStreaming:
        ticks = ticks.withWatermark("event_time", watermark)
    return (
        ticks.groupBy("symbol", F.session_window("event_time", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.min_by("mark", "event_time").alias("first_mark"),
            F.max_by("mark", "event_time").alias("last_mark"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_ticks",
            "first_mark",
            "last_mark",
        )
    )
