"""Domain-level curation — per-registrable-domain quality gating.

The C4/RefinedWeb-style stage a web corpus runs AFTER URL canonicalization
and BEFORE document-level dedup: aggregate the corpus per registrable
domain (doc volume, distinct-page share, mean quality), join a blocklist,
and emit a per-domain verdict so downstream stages can drop entire domains
(spam farms, mirror farms, boilerplate mills) instead of fighting them one
document at a time.

Spark-first shape: ONE domain-keyed aggregation over the corpus (map-side
combinable counts + exact integer quality sums; the distinct-page count
rides the same shuffle), then a broadcast left join against the blocklist
(blocklists are ~1e5 rows — never a shuffle). Linear in the corpus; the
only key that can skew is a genuinely mega-domain, which AQE splits.

Registrable-domain extraction is a documented HEURISTIC core of the public
suffix list: the last two host labels, or the last three when the
second-to-last label is a multi-part-suffix family (``co.uk``-style) —
:data:`MULTI_PART_SECOND`. The full PSL is external data the sandbox
doesn't ship; the hook is the one function below, so swapping in a real
PSL lookup (broadcast map) changes nothing downstream.

Reference parity note: the reference keys quote hygiene per exchange
symbol (tools/schwab.py); per-domain gating is the web-corpus analogue the
LLM-pipeline brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Second-level labels that act as suffix families under short TLDs
#: (``example.co.uk`` → registrable domain ``example.co.uk``, not
#: ``co.uk``). Heuristic PSL core — see module docstring.
MULTI_PART_SECOND = ("co", "com", "net", "org", "gov", "ac", "edu")


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain of a (already lowercased) host column.

    Last two labels, widened to three when the second-to-last label is in
    :data:`MULTI_PART_SECOND` and the TLD is a short (<= 3 char) country
    code — ``a.b.example.co.uk`` → ``example.co.uk``,
    ``blog.example.com`` → ``example.com``. Hosts with one label (or NULL)
    pass through unchanged: an intranet name is its own domain.
    """
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    multi = (
        (n >= 3)
        & F.element_at(labels, -2).isin(*MULTI_PART_SECOND)
        & (F.length(F.element_at(labels, -1)) <= 3)
    )
    take = F.when(multi, F.lit(3)).when(n >= 2, F.lit(2)).otherwise(n)
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


def domain_stats(
    docs: DataFrame,
    domain_col: str = "domain",
    page_col: str = "canonical_url",
    quality_weight_col: str = "q_weight",
    quality_scale: int = 1,
) -> DataFrame:
    """Per-domain aggregates: (domain, n_docs, n_pages, dup_rate,
    mean_quality).

    ``n_pages`` = distinct ``page_col`` values (canonical URLs), so
    ``dup_rate`` = (n_docs - n_pages) / n_docs is the share of documents
    that are URL-exact re-crawls of another page in the domain — the
    mirror-farm signal. ``quality_weight_col`` must be an INTEGER per-doc
    quality weight (callers clamp/scale their score — integer sums stay
    exact and engine-order-independent); ``mean_quality`` is ONE IEEE
    division ``sum / (quality_scale * n_docs)``, bit-identical across
    engines.
    """
    return (
        docs.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col(page_col)).alias("n_pages"),
            F.sum(quality_weight_col).alias("_q_sum"),
        )
        .select(
            domain_col,
            "n_docs",
            "n_pages",
            (
                (F.col("n_docs") - F.col("n_pages")).cast("double")
                / F.col("n_docs")
            ).alias("dup_rate"),
            (
                F.col("_q_sum").cast("double")
                / (F.col("n_docs") * F.lit(quality_scale))
            ).alias("mean_quality"),
        )
    )


def domain_quality_gate(
    stats: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "domain",
    min_docs: int = 3,
    max_dup_rate: float = 0.5,
    min_quality: float = 0.3,
) -> DataFrame:
    """Per-domain verdicts from :func:`domain_stats` output + a blocklist.

    ``blocklist`` carries (domain, reason). Verdict precedence (first hit
    wins, so one domain gets exactly one verdict):

    1. ``blocked`` — on the blocklist (reason rides along);
    2. ``small`` — fewer than ``min_docs`` documents (too little signal to
       judge; C4-style pipelines route these to doc-level gates instead);
    3. ``dup_farm`` — dup_rate above ``max_dup_rate``;
    4. ``low_quality`` — mean_quality below ``min_quality``;
    5. ``keep``.

    The blocklist join is an explicit ``broadcast`` left join: blocklists
    are human-curated (orders of magnitude smaller than the corpus), and
    the gate must not shuffle the stats table a second time for them.
    Output: (domain, n_docs, n_pages, dup_rate, mean_quality, verdict,
    block_reason — NULL unless blocked).
    """
    b = blocklist.select(
        F.col(domain_col).alias("_b_domain"), F.col("reason").alias("_b_reason")
    )
    joined = stats.join(
        F.broadcast(b), stats[domain_col] == b["_b_domain"], "left"
    )
    verdict = (
        F.when(F.col("_b_domain").isNotNull(), "blocked")
        .when(F.col("n_docs") < min_docs, "small")
        .when(F.col("dup_rate") > max_dup_rate, "dup_farm")
        .when(F.col("mean_quality") < min_quality, "low_quality")
        .otherwise("keep")
    )
    return joined.select(
        domain_col,
        "n_docs",
        "n_pages",
        "dup_rate",
        "mean_quality",
        verdict.alias("verdict"),
        F.when(F.col("_b_domain").isNotNull(), F.col("_b_reason"))
        .alias("block_reason"),
    )


def apply_domain_gate(
    docs: DataFrame,
    verdicts: DataFrame,
    domain_col: str = "domain",
    keep: tuple[str, ...] = ("keep",),
) -> DataFrame:
    """The gate's APPLY step: keep only documents whose domain verdict is
    in ``keep`` (the stage that actually drops spam farms and mirrors from
    the corpus, C4-style). One broadcast semi-join — the verdict table has
    one row per domain, orders of magnitude smaller than the corpus, so
    the corpus never shuffles for the purge."""
    keepers = verdicts.where(F.col("verdict").isin(*keep)).select(domain_col)
    return docs.join(F.broadcast(keepers), domain_col, "semi")


def blocklist_df(
    spark: SparkSession, entries: list[tuple[str, str]]
) -> DataFrame:
    """Tiny (domain, reason) blocklist table from literal entries — the
    shape a production run would instead ``spark.read`` from a curated
    file and broadcast."""
    return spark.createDataFrame(entries, "domain string, reason string")
