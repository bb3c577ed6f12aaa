"""Tokenizer merge application: BPE-style greedy pair merging at scale.

A trained BPE/WordPiece tokenizer is an ordered list of merge rules
``(a, b) -> ab``; applying it to a corpus is the single hottest op in a
training-data pipeline (every document, every epoch of data prep). The
kernel here applies a FIXED merge list over word tokens — the same greedy
left-to-right semantics per rule as `github.com/openai/tiktoken`-style
encoders apply per character pair, expressed relationally so the whole
corpus tokenizes as one declarative plan:

- tokens explode once to (doc_id, pos, tok) rows;
- each merge rule is one window pass partitioned by doc_id: mark eligible
  positions (``tok=a`` and next ``=b``), resolve overlaps greedily
  left-to-right (within a maximal run of eligible positions, merge the
  1st, 3rd, ... — for a ≠ b runs are length-1 and this is a no-op; for
  a = b it reproduces exact greedy semantics on token repeats), rewrite
  the merged token, drop the absorbed right-hand rows, renumber;
- every window in every pass partitions by doc_id, so Catalyst plans ONE
  shuffle for the whole cascade and re-sorts within partitions per pass.

Per-document work is O(tokens × merges); the merge list is plan-time
literals (the trained vocab is small and static — at 100 TB it ships in
the plan, never joins). No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def explode_tokens(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, tok) rows; 1-based pos; whitespace tokenization
    identical to ``operators/dedup.py`` (casefold, trim, split on runs)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


def merge_pass(
    toks: DataFrame, a: str, b: str, joined: str | None = None
) -> DataFrame:
    """One merge rule ``(a, b) -> joined`` over (doc_id, pos, tok) rows,
    greedy left-to-right within overlap runs."""
    joined = joined if joined is not None else f"{a}_{b}"
    wd = Window.partitionBy("doc_id").orderBy("pos")
    elig = (F.col("tok") == a) & (F.lead("tok").over(wd) == b)
    step = toks.withColumn("elig", elig)
    if a == b:
        # overlap runs (eligible at consecutive positions) only exist when
        # the rule is a repeat (a = b): resolve greedily left-to-right by
        # merging the 1st, 3rd, ... position of each run (parity within run)
        step = step.withColumn(
            "run_start",
            F.col("elig") & ~F.coalesce(F.lag("elig").over(wd), F.lit(False)),
        )
        step = step.withColumn(
            "grp",
            F.sum(F.col("run_start").cast("int")).over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        wg = Window.partitionBy("doc_id", "grp").orderBy("pos")
        step = step.withColumn(
            "merged", F.col("elig") & (F.row_number().over(wg) % 2 == 1)
        )
    else:
        # a ≠ b: two eligible positions can never be adjacent (that would
        # need tok[i]=a, tok[i+1]=b=a) — every eligible position merges,
        # and three window passes per rule disappear from the plan
        step = step.withColumn("merged", F.col("elig"))
    step = step.withColumn(
        "absorbed", F.coalesce(F.lag("merged").over(wd), F.lit(False))
    )
    return (
        step.filter(~F.col("absorbed"))
        .select(
            "doc_id",
            F.row_number().over(wd).alias("pos"),
            F.when(F.col("merged"), F.lit(joined)).otherwise(F.col("tok")).alias(
                "tok"
            ),
        )
    )


def apply_pair_merges(
    toks: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply an ordered merge list; each rule is one window pass."""
    for a, b in merges:
        toks = merge_pass(toks, a, b)
    return toks


def rebuild_docs(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, text_bpe): the tokenized documents reassembled in
    position order (order pinned via sorted (pos, tok) structs — groupBy
    collect order is not deterministic on its own)."""
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_bpe"),
    )
