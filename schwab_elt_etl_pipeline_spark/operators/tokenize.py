"""Tokenizer training + merge application: BPE-style greedy pair merging
at scale — :func:`train_merges` learns the ordered rule list (count ->
argmax -> rewrite, one corpus pass per rule), :func:`apply_pair_merges`
applies a fixed one.

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


def pair_counts(toks: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies over (doc_id, pos, tok) rows:
    (lhs, rhs, freq), overlapping occurrences counted (``a a a`` yields
    (a, a) twice — the classic BPE counting convention). Map-side
    combinable: one (lhs, rhs) shuffle of partial counts."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn("_nxt", F.lead("tok").over(wd))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(F.col("tok").alias("lhs"), F.col("_nxt").alias("rhs"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_merges(
    toks: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The full iterative BPE learn loop, distributed: repeat ``n_merges``
    times { count adjacent pairs corpus-wide -> take the argmax pair
    (ties broken by (lhs, rhs) ascending — deterministic) -> greedily merge
    it everywhere via :func:`merge_pass` }. Returns the learned merge table
    ``[(step, lhs, rhs, freq_at_selection)]`` and the final token frame.

    Scale shape: per iteration the ONLY driver-side state is the single
    winning (pair, count) row — the counting aggregation is map-side
    combinable and the rewrite is a window pass on the existing doc_id
    partitioning, so each iteration is one pass over the token set
    regardless of corpus size (the reason BPE training parallelizes; cf.
    Sennrich et al. 2016 and the counting step ``bpe_pair_stats``). Each
    iteration local-checkpoints the rewritten tokens so iteration *k* never
    re-executes passes 1..k-1. Stops early when no adjacent pair remains.
    """
    learned: list[tuple[int, str, str, int]] = []
    toks = toks.localCheckpoint(eager=False)
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(toks)
            .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()  # 1-row scalar: the winning pair of this iteration
        )
        if not top:
            break
        lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], int(top[0]["freq"])
        learned.append((step, lhs, rhs, freq))
        toks = merge_pass(toks, lhs, rhs).localCheckpoint(eager=False)
    return learned, toks


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
