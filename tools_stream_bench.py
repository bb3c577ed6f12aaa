"""Streaming throughput benchmark: sustained rows/sec through the five
Structured Streaming paths, measured end-to-end (decode + state + sink +
per-micro-batch checkpoint commits) on ``local[$SPARK_GRAFT_CPUS]``.

The reference is a live streaming ETL (websocket LEVELONE ticks -> parse ->
SQL Server; reference services/schwab_stream.py), so ticks/sec is its
natural headline number — it publishes none, so the claim recorded here is
absolute measured throughput of this engine's equivalents:

1. ``decode_bronze``   — newline-JSON tick files (byte-identical payloads to
   the socket/kafka transports, same ``from_json`` decode) -> date-partitioned
   bronze parquet sink.
2. ``medallion_silver``— parquet tick stream -> per-batch OPT insert-new +
   broadcast surrogate resolve + OPTM max-dedup insert (the full set-based
   silver maintenance, exactly-once by construction).
3. ``candles``         — tick stream -> watermarked 1-minute OHLC windows
   (stateful event-time aggregation) -> append parquet sink.
4. ``corpus_cascade``  — document shards -> quality gate + lang-id +
   fingerprint -> watermarked exactly-once dedup ingest (anti-join sink).
5. ``stateful_smoothing`` — tick stream -> per-contract EWMA of the option
   mark (``applyInPandasWithState``, 1,200 keys of persistent state) ->
   append parquet sink.
6. ``seasonal_baseline`` — event stream -> incremental (event_type, hour)
   median/MAD cells (epoch-keyed merge) -> exactly-once anomaly flags.
7. ``gram_novelty_index`` — document stream -> incremental first-occurrence
   novelty vs a persistent 8-byte n-gram fingerprint index (O(batch)
   probes) -> exactly-once per-doc novelty scores.
8. ``markov_transitions`` — event stream -> incremental Markov transition
   matrix with cross-batch boundary pairs stitched through epoch-stamped
   per-user last-seen state.

Inputs are pre-generated so the measured interval is pure stream processing:
``maxFilesPerTrigger`` slices the input into several micro-batches, so the
rate INCLUDES checkpoint/commit overhead per trigger — the number a
continuously-triggered deployment would sustain, not a single-batch burst.

Env knobs: STREAM_BENCH_TICKS (default 2,000,000), STREAM_BENCH_DOC_COPIES
(default 4 key-shifted copies of $SPARK_GRAFT_SF_DIR documents),
STREAM_BENCH_SHARDS (default 32 input files), STREAM_BENCH_TRIGGER_FILES
(default 8 files/micro-batch), STREAM_BENCH_DIR (default /tmp/stream_bench).

Writes ``STREAMBENCH.md`` and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.session import get_spark
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable

#: 2024-06-17 14:00 UTC — a fixed Monday inside the option universe's life.
_BASE_MS = 1718632800000


def gen_ticks(spark: SparkSession, n: int, shards: int, root: str) -> tuple[str, str]:
    """Deterministic tick corpus: ``n`` rows over a 1,200-contract universe
    (200 strikes x C/P x 3 expiries) with every 20th row an underlying $SPX
    tick — the two message shapes the LEVELONE feed interleaves. Written
    both as parquet shards (the ``files`` transport) and as newline-JSON
    text shards (byte-identical to socket/kafka payloads)."""
    pq_dir, js_dir = f"{root}/ticks_parquet", f"{root}/ticks_json"
    idx = F.col("id") % 1200
    strike = (F.lit(5000) + (idx % 200) * 5).cast("int")
    cp = F.when(F.floor(idx / 200) % 2 == 0, F.lit("C")).otherwise(F.lit("P"))
    expiry = F.element_at(
        F.array(F.lit("240621"), F.lit("240719"), F.lit("240816")),
        F.floor(idx / 400).cast("int") + 1,
    )
    opt_symbol = F.concat(
        F.lit("SPXW  "), expiry, cp, F.lpad((strike * 1000).cast("string"), 8, "0")
    )
    is_under = (F.col("id") % 20) == 0
    received = F.lit(_BASE_MS) + F.col("id") * 5  # 5 ms cadence
    ticks = (
        spark.range(n)
        .select(
            received.alias("received_at"),
            F.when(is_under, F.lit("$SPX")).otherwise(opt_symbol).alias("symbol"),
            F.when(~is_under, F.lit(20.0) + (F.col("id") % 1000) / 100.0).alias("37"),
            F.when(~is_under, received - F.col("id") % 997).alias("38"),
            F.when(is_under, F.lit(5500.0) + (F.col("id") % 500) / 10.0).alias("3"),
            F.when(is_under, received).alias("35"),
        )
        .repartition(shards)
    )
    ticks.write.mode("overwrite").parquet(pq_dir)
    ticks.select(
        F.to_json(
            F.struct("received_at", "symbol", F.col("37"), F.col("38"), F.col("3"), F.col("35"))
        ).alias("value")
    ).write.mode("overwrite").text(js_dir)
    return pq_dir, js_dir


def gen_docs(spark: SparkSession, sf_dir: str, copies: int, shards: int, root: str) -> tuple[str, int]:
    """Key-shifted document replicas + an ingest timestamp for the watermark.
    The shift keeps doc_ids unique so exact-dedup drops only the true
    (content-fingerprint) repeats across copies — which IS the interesting
    load for the dedup state store."""
    out = f"{root}/docs_parquet"
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Shift by the actual id span, not a fixed constant: a constant shift
    # collides once base ids reach it, and id collisions silently drop rows
    # through the id-keyed exactly-once sinks — misreporting throughput.
    span = base.agg(F.max("doc_id") - F.min("doc_id") + 1).first()[0] or 1
    frames = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * span)) for i in range(copies)
    ]
    docs = frames[0]
    for f in frames[1:]:
        docs = docs.unionByName(f)
    docs = docs.withColumn(
        "ingest_ts", F.timestamp_millis(F.lit(_BASE_MS) + (F.col("doc_id") % 3_600_000))
    ).repartition(shards)
    docs.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    return out, n


def gen_events(spark: SparkSession, sf_dir: str, copies: int, shards: int, root: str) -> tuple[str, int]:
    """Key-shifted event replicas for the seasonal-baseline leg: event_ids
    stay unique (exactly-once output is id-keyed) while (event_type, hour,
    value) cells repeat — growing the counts statistic the way real traffic
    would."""
    out = f"{root}/events_parquet"
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Same unique-by-construction shift as gen_docs (see comment there).
    span = base.agg(F.max("event_id") - F.min("event_id") + 1).first()[0] or 1
    frames = [
        base.withColumn("event_id", F.col("event_id") + F.lit(i * span))
        for i in range(copies)
    ]
    ev = frames[0]
    for f in frames[1:]:
        ev = ev.unionByName(f)
    ev = ev.repartition(shards)
    ev.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    return out, n


def _drain(q) -> float:
    t0 = time.perf_counter()
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_ticks = int(os.environ.get("STREAM_BENCH_TICKS", "2000000"))
    copies = int(os.environ.get("STREAM_BENCH_DOC_COPIES", "4"))
    shards = int(os.environ.get("STREAM_BENCH_SHARDS", "32"))
    per_trigger = int(os.environ.get("STREAM_BENCH_TRIGGER_FILES", "8"))
    root = os.environ.get("STREAM_BENCH_DIR", "/tmp/stream_bench")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    from schwab_elt_etl_pipeline_spark.streaming import (
        read_quote_stream,
        windowed_candles,
        write_bronze_stream,
    )
    from schwab_elt_etl_pipeline_spark.streaming.corpus import (
        curate_stream,
        read_document_stream,
        write_curated_stream,
    )
    from schwab_elt_etl_pipeline_spark.streaming.pipeline import run_streaming_silver

    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"generating {n_ticks} ticks ({shards} shards) ...", flush=True)
    pq_dir, js_dir = gen_ticks(spark, n_ticks, shards, root)
    docs_dir, n_docs = gen_docs(spark, sf_dir, copies, shards, root)
    print(f"generated {n_docs} docs", flush=True)
    results: dict[str, dict] = {}

    def record(stage: str, rows: int, wall: float, out_rows: int) -> None:
        results[stage] = {
            "rows_in": rows,
            "wall_s": round(wall, 2),
            "rows_per_s": int(rows / wall),
            "rows_out": out_rows,
        }
        print(f"  {stage}: {rows} rows in {wall:.2f}s -> {results[stage]['rows_per_s']}/s", flush=True)

    # 1. JSON decode -> bronze parquet
    sink, ckpt = f"{root}/bronze", f"{root}/bronze_ckpt"
    q = write_bronze_stream(
        read_quote_stream(spark, js_dir, max_files_per_trigger=per_trigger, fmt="json-files"),
        sink,
        ckpt,
    )
    wall = _drain(q)
    record("decode_bronze", n_ticks, wall, spark.read.parquet(sink).count())

    # 2. medallion silver maintenance (foreachBatch: insert-new + resolve + dedup)
    opt = ParquetTable(spark, f"{root}/opt")
    optm = ParquetTable(spark, f"{root}/optm")
    q = run_streaming_silver(
        read_quote_stream(spark, pq_dir, max_files_per_trigger=per_trigger),
        opt,
        optm,
        f"{root}/silver_ckpt",
    )
    wall = _drain(q)
    record("medallion_silver", n_ticks, wall, optm.read().count())

    # 3. watermarked OHLC candles (stateful event-time aggregation)
    # 30 s watermark (vs the 5 min service default): the synthetic feed is
    # in-order, and a tight watermark lets append mode finalize nearly every
    # window before the availableNow drain ends — rows_out then reflects the
    # real emission volume instead of state still parked at stream end.
    candles = windowed_candles(
        read_quote_stream(spark, pq_dir, max_files_per_trigger=per_trigger),
        watermark="30 seconds",
    )
    q = (
        candles.writeStream.format("parquet")
        .option("path", f"{root}/candles")
        .option("checkpointLocation", f"{root}/candles_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("candles", n_ticks, wall, spark.read.parquet(f"{root}/candles").count())

    # 4. corpus curation + exactly-once dedup ingest
    bronze_docs = ParquetTable(spark, f"{root}/docs_bronze")
    q = write_curated_stream(
        curate_stream(read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)),
        bronze_docs,
        f"{root}/docs_ckpt",
    )
    wall = _drain(q)
    record("corpus_cascade", n_docs, wall, bronze_docs.read().count())

    # 5. stateful per-key smoothing (applyInPandasWithState EWMA of the
    # option mark per contract — 1,200 keys of persistent state)
    from schwab_elt_etl_pipeline_spark.streaming import ewma_stream

    q = (
        ewma_stream(
            read_quote_stream(spark, pq_dir, max_files_per_trigger=per_trigger),
            "37",
            ["symbol"],
            ["received_at"],
            alpha=0.1,
            out="mark_ewma",
        )
        .writeStream.format("parquet")
        .option("path", f"{root}/smoothed")
        .option("checkpointLocation", f"{root}/smooth_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("stateful_smoothing", n_ticks, wall, spark.read.parquet(f"{root}/smoothed").count())

    # 6. incremental seasonal baseline (bounded counts statistic per batch:
    # epoch-keyed merge, weighted-median baseline+MAD recompute, id-keyed
    # exactly-once flag output)
    from schwab_elt_etl_pipeline_spark.streaming.seasonal_stream import seasonal_stream

    ev_dir, n_events = gen_events(spark, sf_dir, copies, shards, root)
    ev_schema = spark.read.parquet(ev_dir).schema
    counts_t = ParquetTable(spark, f"{root}/seasonal_counts")
    flagged_t = ParquetTable(spark, f"{root}/seasonal_flagged")
    q = seasonal_stream(
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(ev_dir),
        counts_t,
        flagged_t,
        f"{root}/seasonal_ckpt",
    )
    wall = _drain(q)
    record("seasonal_baseline", n_events, wall, flagged_t.read().count())

    # 7. incremental gram-novelty index (persistent fingerprint table probe
    # + min-doc claim + insert_new append; doc_id-keyed exactly-once scores)
    from schwab_elt_etl_pipeline_spark.streaming.corpus import update_gram_index

    gram_idx = ParquetTable(spark, f"{root}/gram_index", cluster_by=("gh",))
    gram_scores = ParquetTable(spark, f"{root}/gram_scores")

    def _gram_sink(batch: DataFrame, epoch: int) -> None:
        out = update_gram_index(batch, gram_idx, n=3, epoch=epoch)
        gram_scores.insert_new(out, keys=["doc_id"])

    q = (
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(_gram_sink)
        .option("checkpointLocation", f"{root}/gram_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("gram_novelty_index", n_docs, wall, gram_scores.read().count())

    # 8. incremental Markov transition matrix (delta cells + per-user
    # last-seen state; boundary pairs stitched exactly across triggers)
    from schwab_elt_etl_pipeline_spark.streaming.markov_stream import (
        transition_stream,
    )

    cells_t = ParquetTable(spark, f"{root}/markov_cells")
    last_t = ParquetTable(spark, f"{root}/markov_last")
    q = transition_stream(
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(ev_dir),
        cells_t,
        last_t,
        f"{root}/markov_ckpt",
    )
    wall = _drain(q)
    record("markov_transitions", n_events, wall, cells_t.read().count())

    # 9. incremental near-dup components (MinHash band-index probe per batch
    # feeding the append-only union-find; frontier-only pointer jumping)
    from schwab_elt_etl_pipeline_spark.streaming.components import (
        neardup_components_stream,
    )

    band_idx = ParquetTable(spark, f"{root}/cc_bands")
    members_t = ParquetTable(spark, f"{root}/cc_members")
    remap_t = ParquetTable(spark, f"{root}/cc_remap")
    q = neardup_components_stream(
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger),
        band_idx,
        members_t,
        remap_t,
        f"{root}/cc_ckpt",
    )
    wall = _drain(q)
    record("neardup_components", n_docs, wall, members_t.read().count())

    # 10. incremental KLL quantile sketches (epoch-delta ledger per
    # (event_type, day) cell; replay-safe multiset merge)
    from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import (
        update_quantile_sketch_table,
    )

    qsk_t = ParquetTable(spark, f"{root}/quantile_sketches")

    def _qsk_sink(batch: DataFrame, epoch: int) -> None:
        update_quantile_sketch_table(
            batch, qsk_t, keys=["event_type"], epoch=epoch
        )

    q = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(ev_dir)
        .writeStream.foreachBatch(_qsk_sink)
        .option("checkpointLocation", f"{root}/qsk_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("quantile_sketches", n_events, wall, qsk_t.read().count())

    # 11. incremental bigram-LM model maintenance (held-in n-gram count
    # deltas on the epoch ledger; Zipf-bounded model tables)
    from schwab_elt_etl_pipeline_spark.streaming.lm_stream import lm_stream

    lm_bg = ParquetTable(spark, f"{root}/lm_bigram")
    lm_ug = ParquetTable(spark, f"{root}/lm_unigram")
    q = lm_stream(
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger),
        lm_bg,
        lm_ug,
        f"{root}/lm_ckpt",
    )
    wall = _drain(q)
    record("lm_model_counts", n_docs, wall, lm_bg.read().count())

    # 12. incremental pHash image index (per-batch fixed-point DCT hashes,
    # pigeonhole (block, key) probe, insert_new on (id, block))
    from schwab_elt_etl_pipeline_spark.streaming.corpus import update_phash_index

    ph_idx = ParquetTable(spark, f"{root}/phash_index", cluster_by=("key",))
    ph_pairs = ParquetTable(spark, f"{root}/phash_pairs")

    def _phash_sink(batch: DataFrame, epoch: int) -> None:
        out = update_phash_index(batch, ph_idx).filter(F.col("hamming") <= 4)
        ph_pairs.insert_new(out, keys=["batch_id", "index_id"])

    q = (
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(_phash_sink)
        .option("checkpointLocation", f"{root}/phash_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("phash_image_index", n_docs, wall, ph_pairs.read().count())

    # 13. incremental audio-fingerprint index (per-batch Haitsma-Kalker
    # sign bits over the char-sample grid, same pigeonhole probe protocol)
    from schwab_elt_etl_pipeline_spark.streaming.corpus import update_afp_index

    afp_idx = ParquetTable(spark, f"{root}/afp_index", cluster_by=("key",))
    afp_pairs = ParquetTable(spark, f"{root}/afp_pairs")

    def _afp_sink(batch: DataFrame, epoch: int) -> None:
        out = update_afp_index(batch, afp_idx).filter(F.col("hamming") <= 7)
        afp_pairs.insert_new(out, keys=["batch_id", "index_id"])

    q = (
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(_afp_sink)
        .option("checkpointLocation", f"{root}/afp_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("afp_audio_index", n_docs, wall, afp_pairs.read().count())

    # 14. incremental boilerplate line-frequency index (per-line
    # distinct-doc deltas + doc totals on the epoch ledger)
    from schwab_elt_etl_pipeline_spark.streaming.boilerplate_stream import (
        boilerplate_stream,
        current_boilerplate,
    )

    bl_lines = ParquetTable(spark, f"{root}/bl_lines")
    bl_stats = ParquetTable(spark, f"{root}/bl_stats")
    q = boilerplate_stream(
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger),
        bl_lines,
        bl_stats,
        f"{root}/bl_ckpt",
    )
    wall = _drain(q)
    # serve at an absolute threshold the 40x-copied crawl exercises (the
    # corpus-relative default needs df >= n_docs/25 = 800; the synthetic
    # stream's duplication tops out at the copy count)
    record(
        "boilerplate_line_index",
        n_docs,
        wall,
        current_boilerplate(bl_lines, bl_stats, min_docs=30, min_docs_per=None).count(),
    )

    # 15. incremental canonical-URL exact-dup index (the exact-key front
    # door: canonicalize only the batch with parse_url built-ins, probe the
    # persistent URL table, insert_new keepers). URLs synthesized with the
    # catalog's messy-variant rule, so the 40x copies all collapse.
    from schwab_elt_etl_pipeline_spark.catalog.curation4 import _URL_EXPR
    from schwab_elt_etl_pipeline_spark.streaming.corpus import update_url_index

    url_idx = ParquetTable(spark, f"{root}/url_index", cluster_by=("canonical_url",))
    url_dups = ParquetTable(spark, f"{root}/url_dups")

    def _url_sink(batch: DataFrame, epoch: int) -> None:
        media = batch.select("doc_id", F.expr(_URL_EXPR).alias("url"))
        out = update_url_index(media, url_idx).filter(F.col("is_dup"))
        url_dups.insert_new(out, keys=["doc_id"])

    q = (
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(_url_sink)
        .option("checkpointLocation", f"{root}/url_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("url_canon_index", n_docs, wall, url_dups.read().count())

    # 16. incremental SemDeDup cell index (the semantic member: assign the
    # batch against persisted fixed centroids, probe only its own cells'
    # members, append all). Centroids pre-seeded from the static corpus —
    # the deployment pattern; file-arrival order then doesn't matter.
    from schwab_elt_etl_pipeline_spark.operators.semdedup import seed_centroids
    from schwab_elt_etl_pipeline_spark.streaming.corpus import (
        update_semdedup_index,
    )

    vec_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vspan = vec_base.agg(F.max("vec_id") - F.min("vec_id") + 1).first()[0] or 1
    vecs_all = vec_base
    for i in range(1, copies):
        vecs_all = vecs_all.unionByName(
            vec_base.withColumn("vec_id", F.col("vec_id") + F.lit(i * vspan))
        )
    vecs_dir = f"{root}/vecs_parquet"
    vecs_all.repartition(shards).write.mode("overwrite").parquet(vecs_dir)
    n_vecs = spark.read.parquet(vecs_dir).count()
    sem_idx = ParquetTable(spark, f"{root}/sem_index", cluster_by=("cluster",))
    sem_cents = ParquetTable(spark, f"{root}/sem_cents")
    sem_cents.overwrite_versioned(seed_centroids(vec_base, k=8))
    sem_dups = ParquetTable(spark, f"{root}/sem_dups")

    def _sem_sink(batch: DataFrame, epoch: int) -> None:
        out = update_semdedup_index(batch, sem_idx, sem_cents, k=8, tau=0.35)
        sem_dups.insert_new(out.filter(F.col("is_dup") == 1), keys=["vec_id"])

    q = (
        spark.readStream.schema(vec_base.schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(vecs_dir)
        .writeStream.foreachBatch(_sem_sink)
        .option("checkpointLocation", f"{root}/sem_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    record("semdedup_index", n_vecs, wall, sem_dups.read().count())

    # 17. incremental per-domain stats ledger (the wave-6 domain gate's
    # streaming twin: canonicalize + registrable-domain only the batch,
    # epoch-keyed additive page-grain deltas; current_domain_stats serves
    # the exact batch table). Same messy-URL synthesis as the URL leg.
    from schwab_elt_etl_pipeline_spark.streaming.domain_stream import (
        current_domain_stats,
        update_domain_stats,
    )

    dom_ledger = ParquetTable(spark, f"{root}/dom_ledger")

    def _dom_sink(batch: DataFrame, epoch: int) -> None:
        media = batch.select(
            "doc_id",
            F.expr(_URL_EXPR).alias("url"),
            F.least(F.length("text"), F.lit(400)).alias("q_weight"),
        )
        update_domain_stats(media, dom_ledger, epoch=epoch)

    q = (
        read_document_stream(spark, docs_dir, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(_dom_sink)
        .option("checkpointLocation", f"{root}/dom_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    wall = _drain(q)
    # rows_out = the folded page-grain index size (the synthesis rule maps
    # every doc into ONE registrable domain, so the served per-domain
    # table is a single row — the page grain is the informative count);
    # current_domain_stats still materializes to prove the serve path
    assert current_domain_stats(dom_ledger, quality_scale=400).count() >= 1
    record(
        "domain_stats_ledger",
        n_docs,
        wall,
        dom_ledger.read().select("domain", "canonical_url").distinct().count(),
    )

    payload = {
        "metric": "streaming throughput (rows/sec, end-to-end incl. checkpoints)",
        "ticks": n_ticks,
        "docs": n_docs,
        "events": n_events,
        "shards": shards,
        "files_per_trigger": per_trigger,
        "results": results,
    }
    write_streambench_md(payload)
    print(json.dumps(payload))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


def write_streambench_md(payload: dict) -> None:
    r = payload["results"]
    lines = [
        "# STREAMBENCH — measured Structured Streaming throughput",
        "",
        f"`python tools_stream_bench.py`: {payload['ticks']:,} synthetic LEVELONE",
        f"ticks / {payload['docs']:,} crawl documents, {payload['shards']} input",
        f"shards drained `availableNow` at {payload['files_per_trigger']}",
        "files/micro-batch, so every rate below pays per-trigger checkpoint",
        "commits — the sustained service rate, not a one-batch burst. The JSON",
        "stage decodes the exact byte payloads the socket/kafka transports",
        "deliver (shared `parse_stream_json`).",
        "",
        "| stage | rows in | wall s | rows/sec | rows out |",
        "|---|---|---|---|---|",
    ]
    for stage, v in r.items():
        lines.append(
            f"| {stage} | {v['rows_in']:,} | {v['wall_s']} | "
            f"**{v['rows_per_s']:,}** | {v['rows_out']:,} |"
        )
    lines += [
        "",
        "The reference publishes no throughput numbers (BASELINE.md); its",
        "ingest path is a single-threaded websocket handler writing to SQL",
        "Server per message batch. The rates above are one `local[32]` node.",
        "decode/candles/corpus shuffle only on their state key (symbol /",
        "window / fingerprint), so executors scale them out;",
        "`medallion_silver` additionally anti-joins every batch against the",
        "OPTM key set it has accumulated, so its rate is net of that growing",
        "read — the honest price of exactly-once inserts (a served deployment",
        "bounds it by date-partitioning the sink so the anti-join prunes to",
        "the partitions a batch can touch). `stateful_smoothing` crosses the",
        "Arrow/pandas boundary every batch (applyInPandasWithState is the",
        "sanctioned Python edge) — its rate is the honest cost of per-key",
        "Python state, and it still emits every input row downstream.",
        "`seasonal_baseline` re-derives the exact per-cell median/MAD",
        "baseline from its bounded counts statistic EVERY batch and",
        "insert_new-guards both sinks, so its rate prices the full",
        "maintain-and-flag loop, not just ingestion. `semdedup_index` probes",
        "the ACCUMULATED cell index per batch (O(batch x cell) pair work +",
        "an insert_new-guarded sink), so it is the slowest leg by design;",
        "its input is fixed at 4 key-shifted copies of the sf0.1 embeddings",
        "(8,000 vecs, 32 shards, 8 files/trigger). Rate history: r11 447,",
        "r12 301, r13 idle A/B 525-630 docs/s — an interleaved matched-input",
        "A/B of the r12 try_divide/norm-hoist commit vs its parent (3 runs",
        "each, identical 5,721-row outputs) read medians 549 vs 576, i.e.",
        "the r12 dip was driver-host load during that regen, not code.",
        "",
        "**Why `rows out` drifts a little across regens** (r13 advice item):",
        "the incremental-index legs are deterministic GIVEN a micro-batch",
        "slicing, but the slicing itself is not pinned across regens: the",
        "file source orders shards by modification time with ties broken by",
        "listing order over freshly-UUID-named part files, so each regen",
        "deals the same rows into different 8-file batches. Stages whose",
        "state accumulates per batch are arrival-order-sensitive by design —",
        "which vector seeds a semdedup cell, which borderline gram crosses",
        "the LM count threshold at a batch cut, whether a candle's last row",
        "lands before or after the watermark advances — so their output",
        "SETS shift by a handful of rows (e.g. semdedup_index 5,694 vs",
        "5,732 across regens) while any FIXED input+slicing reproduces",
        "exactly (the 6-run matched-input A/B above: identical 5,721-row",
        "outputs every run). Batch analytics are unaffected — this is the",
        "standard contract of order-sensitive streaming state, not a",
        "correctness gap in the operators.",
        "",
        "```json",
        json.dumps(payload),
        "```",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "STREAMBENCH.md")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
