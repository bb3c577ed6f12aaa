"""Round-7 behavioral-statistics wave: market-basket association rules,
per-entity autocorrelation, and label-propagation communities.

``assoc_rules_lift`` is the a-priori co-occurrence statistic (support /
confidence / lift) over per-user event-type baskets — the classic
"users who do A also do B" miner. ``t_acf_lags`` is the per-user
autocorrelation function at small lags, the standard seriality diagnostic
that decides whether the recurrence family (EWMA / Holt) has signal to
smooth. Both are native-expression plans whose floating-point outputs are
derived from EXACT decimal/integer moments (the ``a_corr_matrix`` /
``a_ols_trend_exact`` discipline), so they hash-match DuckDB at any
parallelism.

Reference scope: the reference's analytics stack stops at the windowed
aggregates surveyed in SURVEY §2.6 (docs/sql_server.md); these two are part
of the LLM-pipeline extension (behavioral mixing signals / series
diagnostics), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table

_MIN_PAIR_SUPPORT = 5
_ACF_LAGS = 3


def rules_from_baskets(baskets: DataFrame, min_support: int) -> DataFrame:
    """Directional association rules from a (user_id, items sorted-array)
    basket table: (antecedent, consequent, pair_cnt, ante_cnt, cons_cnt,
    support, confidence, lift). The a-priori core of ``assoc_rules_lift``,
    factored out so random-basket property tests (test_behavioral) can
    drive it directly. ``baskets`` should be materialized by the caller
    when it feeds multiple branches (this function reads it three times)."""
    item = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = baskets.groupBy().agg(F.count(F.lit(1)).alias("nb"))
    pair_expr = F.when(
        F.size("items") < 2,
        F.array().cast("array<struct<a:string,b:string>>"),
    ).otherwise(
        F.expr(
            "flatten(transform(sequence(1, size(items) - 1),"
            " i -> transform(sequence(i + 1, size(items)),"
            "      j -> struct(items[i-1] AS a, items[j-1] AS b))))"
        )
    )
    pc = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_support)
    )
    rules = pc.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("antecedent"),
                    F.col("b").alias("consequent"),
                    F.col("pair_cnt"),
                ),
                F.struct(
                    F.col("b").alias("antecedent"),
                    F.col("a").alias("consequent"),
                    F.col("pair_cnt"),
                ),
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.pair_cnt")
    ia = item.select(
        F.col("item").alias("antecedent"), F.col("cnt").alias("ante_cnt")
    )
    ic = item.select(
        F.col("item").alias("consequent"), F.col("cnt").alias("cons_cnt")
    )
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "pair_cnt",
            "ante_cnt",
            "cons_cnt",
            F.round(F.col("pair_cnt").cast("double") / F.col("nb"), 6).alias(
                "support"
            ),
            F.round(
                F.col("pair_cnt").cast("double") / F.col("ante_cnt"), 6
            ).alias("confidence"),
            F.round(
                (F.col("pair_cnt") * F.col("nb")).cast("double")
                / (F.col("ante_cnt") * F.col("cons_cnt")),
                6,
            ).alias("lift"),
        )
    )


def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over per-user event-type baskets:
    for every ordered pair (antecedent → consequent) co-occurring in at
    least ``_MIN_PAIR_SUPPORT`` baskets, emit support, confidence and lift.

    Shape (a-priori, vocabulary-bounded): ONE distinct shuffle builds the
    (user, item) incidence; baskets collapse to sorted item sets and the
    i<j pair expansion runs as a native array transform — no self-join, so
    the quadratic blow-up is bounded by per-basket item cardinality (the
    item vocabulary), never by basket count. Item counts are a
    vocabulary-sized broadcast; the basket total rides a broadcast 1-row
    crossJoin (sanctioned scalar pattern). All three metrics are single
    IEEE divisions of exact integer counts — deterministic at any
    parallelism. At 100 TB the only data-sized moves are the incidence
    distinct and the basket groupBy: two map-side-combinable shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    # ONE pass builds the basket table and every other branch (item counts,
    # basket total, pair expansion) derives from it — localCheckpoint pins
    # the diamond so the scan+distinct+groupBy chain runs once, not once
    # per branch (the pipeline_verts_e2e diamond discipline).
    baskets = (
        ev.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("items"))
        .localCheckpoint(eager=True)
    )
    return rules_from_baskets(baskets, _MIN_PAIR_SUPPORT)


ASSOC_RULES_SQL = f"""
WITH b AS (
  SELECT DISTINCT user_id, event_type FROM events
), n AS (
  SELECT COUNT(DISTINCT user_id) AS nb FROM b
), ic AS (
  SELECT event_type, COUNT(*) AS cnt FROM b GROUP BY event_type
), pc AS (
  SELECT x.event_type AS a, y.event_type AS b2, COUNT(*) AS pair_cnt
  FROM b x JOIN b y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY x.event_type, y.event_type
  HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT}
), rules AS (
  SELECT a AS antecedent, b2 AS consequent, pair_cnt FROM pc
  UNION ALL
  SELECT b2 AS antecedent, a AS consequent, pair_cnt FROM pc
)
SELECT r.antecedent, r.consequent, r.pair_cnt,
       ia.cnt AS ante_cnt, ic2.cnt AS cons_cnt,
       ROUND(CAST(r.pair_cnt AS DOUBLE) / n.nb, 6) AS support,
       ROUND(CAST(r.pair_cnt AS DOUBLE) / ia.cnt, 6) AS confidence,
       ROUND(CAST(r.pair_cnt * n.nb AS DOUBLE) / (ia.cnt * ic2.cnt), 6)
         AS lift
FROM rules r
JOIN ic ia  ON ia.event_type = r.antecedent
JOIN ic ic2 ON ic2.event_type = r.consequent
CROSS JOIN n
"""


def t_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation of the event value series at lags 1..3.

    One entity-keyed window pass computes all three lagged columns
    (ordering ties broken by event_id); an array explode unpivots the lags;
    one grouped aggregation accumulates EXACT decimal moments per
    (user, lag) — value is exact 2-dp data, so every power/cross sum is an
    exactly-held decimal and the Pearson formula runs as one fixed IEEE
    expression over their double casts (the ``a_corr_matrix`` discipline).
    ``+ 0.0`` canonicalizes IEEE −0.0 before hashing. Degenerate series
    (fewer than 2 pairs, or zero variance on either side) yield NULL.
    At 100 TB: one window exchange + one map-side-combinable groupBy, both
    keyed on the same entity column.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    y = F.col("value").cast("decimal(12,2)")
    lagged = ev.select(
        "user_id",
        y.alias("y"),
        *[F.lag(y, k).over(w).alias(f"y_{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    pairs = lagged.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("y").alias("yt"),
                        F.col(f"y_{k}").alias("yl"),
                    )
                    for k in range(1, _ACF_LAGS + 1)
                ]
            )
        ).alias("p"),
    ).select("user_id", "p.lag", "p.yt", "p.yl").filter(F.col("yl").isNotNull())
    m = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("yt").cast("double").alias("s1"),
        F.sum("yl").cast("double").alias("s2"),
        F.sum(F.col("yt") * F.col("yt")).cast("double").alias("s11"),
        F.sum(F.col("yl") * F.col("yl")).cast("double").alias("s22"),
        F.sum(F.col("yt") * F.col("yl")).cast("double").alias("s12"),
    )
    n = F.col("n_pairs").cast("double")
    varx = n * F.col("s11") - F.col("s1") * F.col("s1")
    vary = n * F.col("s22") - F.col("s2") * F.col("s2")
    cov = n * F.col("s12") - F.col("s1") * F.col("s2")
    ok = (F.col("n_pairs") >= 2) & (varx > 0.0) & (vary > 0.0)
    return m.select(
        "user_id",
        "lag",
        "n_pairs",
        F.when(ok, F.round(cov / (F.sqrt(varx) * F.sqrt(vary)), 6) + 0.0).alias(
            "acf"
        ),
    )


T_ACF_SQL = f"""
WITH lagged AS (
  SELECT user_id, CAST(value AS DECIMAL(12,2)) AS y,
         {", ".join(
             f"LAG(CAST(value AS DECIMAL(12,2)), {k}) OVER "
             f"(PARTITION BY user_id ORDER BY ts, event_id) AS y_{k}"
             for k in range(1, _ACF_LAGS + 1)
         )}
  FROM events
), pairs AS (
  {" UNION ALL ".join(
      f"SELECT user_id, {k} AS lag, y AS yt, y_{k} AS yl FROM lagged "
      f"WHERE y_{k} IS NOT NULL"
      for k in range(1, _ACF_LAGS + 1)
  )}
), m AS (
  SELECT user_id, lag, COUNT(*) AS n_pairs,
         CAST(SUM(yt) AS DOUBLE) AS s1,
         CAST(SUM(yl) AS DOUBLE) AS s2,
         CAST(SUM(yt * yt) AS DOUBLE) AS s11,
         CAST(SUM(yl * yl) AS DOUBLE) AS s22,
         CAST(SUM(yt * yl) AS DOUBLE) AS s12
  FROM pairs GROUP BY user_id, lag
)
SELECT user_id, lag, n_pairs,
       CASE WHEN n_pairs >= 2
             AND n_pairs * s11 - s1 * s1 > 0.0
             AND n_pairs * s22 - s2 * s2 > 0.0
            THEN ROUND((n_pairs * s12 - s1 * s2)
                       / (sqrt(n_pairs * s11 - s1 * s1)
                          * sqrt(n_pairs * s22 - s2 * s2)), 6) + 0.0
       END AS acf
FROM m
"""


def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered pair of consecutive event types within a user's timeline,
    the transition count and conditional probability P(next | prev) — the
    order-aware complement of ``assoc_rules_lift`` (which ignores order).

    One entity-keyed window pass pairs each event with its successor
    (ties broken by event_id); one map-side-combinable groupBy collapses
    to the vocabulary² cell table; the row-normalization runs as a window
    sum OVER that bounded table — no second data-sized shuffle anywhere.
    The probability is a single IEEE division of exact integer counts.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("next"),
    ).filter(F.col("next").isNotNull())
    cells = pairs.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("cnt"))
    row_tot = Window.partitionBy("prev")
    return cells.select(
        "prev",
        "next",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / F.sum("cnt").over(row_tot).cast("double"),
            6,
        ).alias("prob"),
    )


EVENT_TRANSITION_SQL = """
WITH pairs AS (
  SELECT event_type AS prev,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events
), cells AS (
  SELECT prev, next, COUNT(*) AS cnt
  FROM pairs WHERE next IS NOT NULL GROUP BY prev, next
)
SELECT prev, next, cnt,
       ROUND(CAST(cnt AS DOUBLE)
             / CAST(SUM(cnt) OVER (PARTITION BY prev) AS DOUBLE), 6) AS prob
FROM cells
"""


_LPA_ROUNDS = 3


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over the co-click item graph — ``_LPA_ROUNDS`` deterministic
    rounds: every node adopts the label that the MOST neighbors carried at
    the previous round, ties broken toward the smallest label, seeded with
    each node's own id. The total tie-break makes synchronous LPA exactly
    reproducible, so the result hash-matches an unrolled-CTE DuckDB oracle
    — the same certification discipline as ``pagerank_fixed_point``
    (integer votes, no floats to reorder).

    Per round: ONE node-keyed equi-join of the edge list against the
    node-sized label table (broadcast at catalog-bounded vocabulary; at
    larger graphs it becomes a shuffled hash join on the same key) + one
    map-side-combinable vote count + one ``max_by`` argmax — the Pregel
    message/combine/apply shape expressed relationally (delegates to
    ``operators/graph.py label_propagation``, property-tested against a
    sequential reference). Community ids converge to per-component minima;
    unlike connected components, dense subgraphs keep distinct labels
    across bridges.
    """
    from schwab_elt_etl_pipeline_spark.operators.graph import label_propagation

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.from_json("props", "k INT")["k"].alias("item"))
        .distinct()
    )
    other = clicks.select(F.col("user_id"), F.col("item").alias("dst"))
    edges = (
        clicks.join(other, "user_id")
        .filter(F.col("item") != F.col("dst"))
        .select(F.col("item").alias("src"), "dst")
        .distinct()
    )
    labels = label_propagation(edges, rounds=_LPA_ROUNDS)
    return labels.select("node", F.col("label").alias("community"))


def _lpa_sql() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""v{i} AS (
  SELECT e.dst AS node, p.label, COUNT(*) AS cnt
  FROM edges e JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst, p.label
), l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM v{i})
  WHERE rn = 1
)""")
        prev = f"l{i}"
    return f"""
WITH clicks AS (
  SELECT DISTINCT user_id, CAST(props->>'$.k' AS INT) AS item
  FROM events WHERE event_type = 'click'
), edges AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM clicks a JOIN clicks b USING (user_id) WHERE a.item <> b.item
), l0 AS (
  SELECT src AS node, src AS label FROM (SELECT DISTINCT src FROM edges)
), {", ".join(rounds)}
SELECT node, label AS community FROM {prev}
"""


LPA_SQL = _lpa_sql()


def behavior_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral concentration: the Herfindahl–Hirschman index of
    the user's event-type distribution, ``hhi = Σ_i (cnt_i / total)²`` —
    1.0 for single-behavior users, → 1/|types| for uniform ones. The
    diversity signal curation mixes use next to novelty and quality (and
    deliberately LOG-FREE, unlike entropy: the repo's determinism
    discipline keeps transcendentals out of hash-gated outputs — the HHI
    is one division of exact integer sums). Two nested map-side-combinable
    aggregations on the same user key — one shuffle at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_type.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            / (F.sum("cnt") * F.sum("cnt")).cast("double"),
            6,
        ).alias("hhi"),
    )


BEHAVIOR_HHI_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (→ float64 in pandas);
       -- Spark sum(long) stays long — pin BIGINT for a type-stable hash
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       ROUND(CAST(SUM(cnt * cnt) AS DOUBLE)
             / CAST(SUM(cnt) * SUM(cnt) AS DOUBLE), 6) AS hhi
FROM per_type GROUP BY user_id
"""


_KM_K = 8
_KM_ITERS = 2
_KM_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def kmeans_lloyd_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd's k-means TRAINING loop (k=8 seeds = vectors 0..7, 2
    iterations, cosine assignment), certified end-to-end: the output is the
    final per-(cluster, dim) centroid cell table, and the DuckDB oracle
    re-runs both iterations as chained MATERIALIZED CTEs — so the hash
    match certifies assignment AND re-estimation, iterated. This closes the
    iterative-trainer story next to ``bpe_train_merges``: per iteration the
    driver sees only the k×d rounded centroid cells (the M-step result),
    exactly like BPE's one argmax row per round.

    Determinism stack (all established-idiom): cosine rounded to 6 with
    cent_id tie-break (``kmeans_assign_fixed``); means from exact
    DECIMAL(28,12) sums over a posexplode, rounded 6
    (``label_centroid_cells`` — shared function, shared discipline);
    re-broadcast centroids are those rounded doubles on BOTH sides, so
    iteration 2 sees bit-identical inputs. Clusters that capture no
    vectors drop from the next round in both engines. Scale shape per
    iteration: one broadcast crossJoin E-step (corpus never shuffles) +
    one (cluster, dim)-keyed partial-sum M-step — vectors move zero times.
    """
    from schwab_elt_etl_pipeline_spark.operators.similarity import (
        as_double,
        centroid_fold,
        l2_norm,
        label_centroid_cells,
        nearest_centroid_struct,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", as_double("embedding").alias("v")
    ).localCheckpoint(eager=False)
    cent_rows = [
        (int(r.cent_id), list(r.c_vec))
        for r in emb.filter(F.col("vec_id") < _KM_K)
        .select(
            F.col("vec_id").cast("int").alias("cent_id"),
            as_double("embedding").alias("c_vec"),
        )
        .collect()
    ]
    cells = None
    # E-step as a pure projection (guide §2.4): the ≤k-row centroid table
    # folds to ONE broadcast array row and the argmax is a per-row fold —
    # no k× fan-out, no per-vector argmax window shuffle; the hoisted norms
    # evaluate the identical dot/(vn*cn) tree, so the rounded cosine and
    # the winning cluster are bit-identical to the former window form.
    best = nearest_centroid_struct(F.col("v"), F.col("_vn"), zero_safe=False)
    for _ in range(_KM_ITERS):
        cent_df = spark.createDataFrame(
            cent_rows, "cent_id int, c_vec array<double>"
        )
        assigned = (
            vecs.withColumn("_vn", l2_norm(F.col("v")))
            .crossJoin(F.broadcast(centroid_fold(cent_df)))
            .withColumn("_best", best)
            .select("vec_id", "v", F.col("_best")["cid"].alias("cluster"))
        )
        cells = label_centroid_cells(assigned, label_col="cluster", vec_col="v")
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cells.collect():
            by_cluster.setdefault(int(r.label), {})[int(r.dim)] = float(
                r.centroid
            )
        cent_rows = [
            (cl, [dims[d] for d in sorted(dims)])
            for cl, dims in sorted(by_cluster.items())
        ]
    return cells.select(
        F.col("label").cast("int").alias("cluster"),
        F.col("dim").cast("int").alias("dim"),
        "n",
        "centroid",
    )


def _kmeans_sql() -> str:
    cos = _KM_COS.format(a="v", b="c_vec")
    steps = []
    prev_c = "c0"
    for i in range(1, _KM_ITERS + 1):
        steps.append(f"""s{i} AS MATERIALIZED (
  SELECT q.vec_id, c.cent_id, ROUND({cos}, 6) AS cos
  FROM q, {prev_c} c
), a{i} AS MATERIALIZED (
  SELECT vec_id, cent_id AS cluster FROM s{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY cos DESC, cent_id ASC) = 1
), m{i} AS MATERIALIZED (
  SELECT t.cluster, i AS dim, COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(t.v[i] AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*), 6) AS centroid
  FROM (SELECT a.cluster, q.v FROM a{i} a JOIN q ON a.vec_id = q.vec_id) t,
       UNNEST(generate_series(1, LEN(t.v))) AS g(i)
  GROUP BY t.cluster, i
), c{i} AS MATERIALIZED (
  SELECT cluster AS cent_id, LIST(centroid ORDER BY dim) AS c_vec
  FROM m{i} GROUP BY cluster
)""")
        prev_c = f"c{i}"
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cent_id, embedding::DOUBLE[] AS c_vec
  FROM embeddings WHERE vec_id < {_KM_K}
), {", ".join(steps)}
SELECT cluster, CAST(dim AS INT) AS dim, n, centroid FROM m{_KM_ITERS}
"""


KMEANS_LLOYD_SQL = _kmeans_sql()


_RRF_K = 60          # Cormack et al. 2009 constant
_RRF_ARM_DEPTH = 100  # per-arm candidate depth
_RRF_TOPN = 20


def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of a
    lexical BM25 arm over ``documents`` and a dense cosine arm over
    ``embeddings`` (vec_id as the shared document key, query = vector 0) —
    the RAG-stack ranker ensemble. ``rrf = Σ_arms 1/(K + rank)``, K=60;
    documents surfaced by either arm fuse via a full outer join.

    Scale shape: each arm reduces to its top-``_RRF_ARM_DEPTH`` via
    sort-limit (TakeOrdered — per-partition top-k then a bounded merge,
    never a global sort materialization); ranking then runs on ≤100-row
    frames. The dense arm reuses ``brute_force_topk`` (broadcast 1-query
    certification arm — the IVF/PQ index queries are the production path
    at corpus scale). All rank arithmetic is single IEEE divisions of
    exact integers in fixed order — hash-stable at any parallelism.
    """
    from schwab_elt_etl_pipeline_spark.catalog.analytics6 import bm25_retrieval
    from schwab_elt_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    w1 = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        bm25_retrieval(spark, sf_dir)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_RRF_ARM_DEPTH)
        .select("doc_id", F.row_number().over(w1).cast("long").alias("lex_rank"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    w2 = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    dense = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=_RRF_ARM_DEPTH)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(w2).cast("long").alias("dense_rank"),
        )
    )
    arm = lambda r: F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)), F.lit(0.0)
    )
    return (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(arm("lex_rank") + arm("dense_rank"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_RRF_TOPN)
    )


RRF_SQL = f"""
WITH lex_scored AS ({{bm25}}),
lex_top AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
  FROM lex_scored
  QUALIFY lex_rank <= {_RRF_ARM_DEPTH}
), q AS (
  SELECT embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id = 0
), dense_scored AS (
  SELECT vec_id,
         ROUND({{cos}}, 6) AS cos
  FROM (SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings), q
  WHERE vec_id <> 0
), dense_top AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS dense_rank
  FROM dense_scored
  QUALIFY dense_rank <= {_RRF_ARM_DEPTH}
)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
       ROUND(COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + l.lex_rank), 0.0)
             + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + d.dense_rank), 0.0), 6)
         AS rrf
FROM lex_top l FULL JOIN dense_top d ON l.doc_id = d.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {_RRF_TOPN}
"""


def _rrf_sql() -> str:
    from schwab_elt_etl_pipeline_spark.catalog.analytics6 import BM25_SQL

    cos = (
        "list_dot_product(q_vec, c_vec) / "
        "(sqrt(list_dot_product(q_vec, q_vec))"
        " * sqrt(list_dot_product(c_vec, c_vec)))"
    )
    return RRF_SQL.format(bm25=BM25_SQL, cos=cos)


SPECS = [
    QuerySpec(
        "kmeans_lloyd_train", kmeans_lloyd_train, KMEANS_LLOYD_SQL,
        headline=True,
        doc="full Lloyd's k-means training loop (2 iterations, k=8) — "
            "assignment AND re-estimation certified by chained "
            "materialized-CTE oracle; driver sees only k×d centroid cells "
            "per round",
    ),
    QuerySpec(
        "retrieval_rrf_hybrid", retrieval_rrf_hybrid, _rrf_sql(),
        doc="reciprocal-rank fusion of BM25 and dense-cosine arms — the "
            "hybrid-retrieval ranker ensemble, bounded per-arm depth",
    ),
    QuerySpec(
        "graph_label_propagation", graph_label_propagation, LPA_SQL,
        doc="synchronous label-propagation communities over the co-click "
            "graph — deterministic ties, unrolled-CTE-certified like the "
            "fixed-point PageRank",
    ),
    QuerySpec(
        "assoc_rules_lift", assoc_rules_lift, ASSOC_RULES_SQL,
        doc="market-basket association rules (support/confidence/lift) over "
            "per-user event-type baskets — a-priori, vocabulary-bounded "
            "pair expansion, no self-join",
    ),
    QuerySpec(
        "behavior_concentration_hhi", behavior_concentration_hhi,
        BEHAVIOR_HHI_SQL,
        doc="per-user Herfindahl concentration of event types — log-free "
            "diversity signal, one user-keyed shuffle",
    ),
    QuerySpec(
        "event_transition_probs", event_transition_probs, EVENT_TRANSITION_SQL,
        doc="first-order Markov transition matrix P(next|prev) over user "
            "timelines — order-aware complement of assoc_rules_lift",
    ),
    QuerySpec(
        "t_acf_lags", t_acf_lags, T_ACF_SQL,
        doc="per-user autocorrelation at lags 1..3 from exact decimal "
            "moments — the seriality diagnostic for the recurrence family",
    ),
]
