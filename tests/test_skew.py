"""Salted aggregation / join correctness: results must equal the unsalted
plans regardless of salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join_skewed_left,
)


def test_salted_agg_equals_plain(spark):
    # 90% of rows share one hot key
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {"_s": F.sum(F.col("v").cast("decimal(18,4)")), "_c": F.count(F.lit(1))},
        {"total": F.sum("_s").cast("double"), "n": F.sum("_c")},
    )
    plain = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_equals_plain(spark):
    left = spark.range(10_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "k long, rv string")
    salted = salted_join_skewed_left(left, right, on=["k"])
    plain = left.join(right, on=["k"])
    assert salted.count() == plain.count() == 10_000
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_point_in_interval_join_boundaries(spark):
    """Bucket rewrite exactness at the edges: inclusive endpoints, intervals
    crossing a bucket boundary, and over-length intervals rejected."""
    import datetime as dt

    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.interval import point_in_interval_join

    t0 = dt.datetime(2024, 6, 17, 0, 59, 30)  # 30s before the hour bucket edge
    intervals = spark.createDataFrame(
        [
            (1, 101, t0, t0 + dt.timedelta(seconds=60)),   # crosses bucket edge
            (1, 102, t0, t0 + dt.timedelta(seconds=7200)), # too long → rejected
        ],
        "k int, iid int, s timestamp_ntz, e timestamp_ntz",
    )
    points = spark.createDataFrame(
        [
            (1, 201, t0),                                  # == start (inclusive)
            (1, 202, t0 + dt.timedelta(seconds=60)),       # == end (inclusive)
            (1, 203, t0 + dt.timedelta(seconds=45)),       # inside, next bucket
            (1, 204, t0 + dt.timedelta(seconds=61)),       # just outside
            (2, 205, t0),                                  # wrong key
        ],
        "k int, pid int, p timestamp_ntz",
    )
    got = point_in_interval_join(
        points, intervals, point_ts="p", start_ts="s", end_ts="e",
        on=["k"], max_interval_seconds=3600,
    )
    pairs = {(r["pid"], r["iid"]) for r in got.collect()}
    assert pairs == {(201, 101), (202, 101), (203, 101)}
    # each match exactly once despite the 2-bucket explode
    assert got.count() == 3


def test_fuzzy_pairs_blocking_and_threshold(spark):
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha-001"),
            (2, "alpha-002"),   # dist 1 from #1, same block
            (3, "alpha-900"),   # dist 2 from #1 → over threshold
            (4, "betaa-001"),   # different block: never compared with #1
        ],
        "id long, name string",
    )
    got = fuzzy_pairs(
        df, "id", "name", block_exprs=[F.substring("name", 1, 6)], max_dist=1
    )
    pairs = {(r["a_id"], r["b_id"], r["dist"]) for r in got.collect()}
    assert pairs == {(1, 2, 1)}


def test_quarantine_splits_and_reasons(spark):
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.quality import dq_summary, quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -3.0, "A"), (3, 5.0, None), (4, -1.0, None)],
        "id long, amount double, tag string",
    )
    rules = {
        "amount_pos": F.col("amount") > 0,
        "tag_present": F.col("tag").isNotNull(),
    }
    clean, bad = quarantine(df, rules)
    assert {r["id"] for r in clean.collect()} == {1}
    reasons = {r["id"]: set(r["_failed_rules"]) for r in bad.collect()}
    assert reasons == {
        2: {"amount_pos"},
        3: {"tag_present"},
        4: {"amount_pos", "tag_present"},
    }
    summary = dq_summary(df, rules).first()
    assert summary["n_rows"] == 4
    assert summary["viol_amount_pos"] == 2 and summary["viol_tag_present"] == 2


def test_hash_bucket_nonnegative_for_negative_keys(spark):
    """xxhash64 surrogates are signed; buckets must still land in [0, n) so
    sampling thresholds hold (Spark % preserves sign — pmod required)."""
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.sampling import (
        hash_bucket,
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(-(10**18) - i, "s") for i in range(200)] + [(i, "s") for i in range(200)],
        "k long, src string",
    )
    stats = df.select(hash_bucket("k").alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < 1000
    kept = stratified_hash_sample(df, "k", "src", {"s": 0.0}).count()
    assert kept == 0  # fraction 0 keeps nothing, negative keys included


def test_bloom_no_false_negatives_and_low_fp(spark):
    """Bloom contract: every inserted key passes membership (prefilter →
    exact-confirm can never lose a row), and the false-positive rate on
    disjoint keys stays near the (1-e^{-kn/m})^k design point (~0.07% at
    n=500, m=16384, k=3 — assert an order-of-magnitude slack bound)."""
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.bloom import (
        bloom_member,
        build_bloom,
    )

    inserted = spark.range(0, 500).select(F.col("id").alias("key"))
    bloom = build_bloom(inserted, "key")
    hits = (
        inserted.crossJoin(F.broadcast(bloom))
        .filter(bloom_member(F.col("key"), F.col("arr")))
        .count()
    )
    assert hits == 500, "bloom dropped an inserted key (false negative)"

    outside = spark.range(10_000, 20_000).select(F.col("id").alias("key"))
    fp = (
        outside.crossJoin(F.broadcast(bloom))
        .filter(bloom_member(F.col("key"), F.col("arr")))
        .count()
    )
    assert fp / 10_000 < 0.02, f"false-positive rate off the design point: {fp}"


def test_bloom_non_multiple_of_64_bits_has_no_false_negatives(spark):
    """Regression: a floored word count with bits % 64 != 0 dropped the top
    positions from the array — inserted keys hashing there probed past the
    end (NULL → silent false negatives). Ceil-sized arrays must hold all."""
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.bloom import (
        bloom_member,
        build_bloom,
    )

    inserted = spark.range(0, 2000).select(F.col("id").alias("key"))
    bloom = build_bloom(inserted, "key", bits=1000)
    hits = (
        inserted.crossJoin(F.broadcast(bloom))
        .filter(bloom_member(F.col("key"), F.col("arr"), bits=1000))
        .count()
    )
    assert hits == 2000


def test_observed_rules_ride_the_action(spark, tmp_path):
    """observe()-based DQ: counters equal dq_summary's, computed as a side
    effect of the pipeline's own write — no second scan. Also verifies the
    metrics survive a real sink action, not just collect()."""
    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.operators.quality import (
        dq_summary,
        observed_rules,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -3.0, "A"), (3, 5.0, None), (4, -1.0, None)],
        "id long, amount double, tag string",
    )
    rules = {
        "amount_pos": F.col("amount") > 0,
        "tag_present": F.col("tag").isNotNull(),
    }
    observed, obs = observed_rules(df, rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    want = dq_summary(df, rules).first().asDict()
    assert obs.get == want
    # the write itself was complete and untouched by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4
