"""Stream ≡ batch parity for the incremental connected-components index
(streaming/components.py vs operators/dedup.py connected_components).

The pins the round-8 directive asks for: components match the batch
operator across ≥3 batches INCLUDING component-merge events, epoch replay
adds nothing, and compaction is read-bit-identical.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.dedup import connected_components
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.components import (
    compact_components,
    current_components,
    update_components_index,
)

_SCHEMA = "a_id long, b_id long"


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="cc_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _comps(df):
    return {r.node: r.comp for r in df.collect()}


def test_incremental_components_match_batch_across_merges(spark, wh):
    """Three edge batches where batch 3 MERGES two components built by the
    earlier batches; after each prefix the resolved mapping equals the
    batch operator over every edge delivered so far."""
    members = ParquetTable(spark, f"{wh}/members")
    remap = ParquetTable(spark, f"{wh}/remap")
    batches = [
        [(1, 2), (5, 6)],          # two fresh components
        [(7, 8), (2, 3)],          # extend {1,2} -> {1,2,3}; new {7,8}
        [(3, 5), (8, 9)],          # MERGE {1,2,3}+{5,6} -> 1; extend {7,8,9}
    ]
    seen: list[tuple[int, int]] = []
    for epoch, edges in enumerate(batches, start=1):
        update_components_index(
            spark.createDataFrame(edges, _SCHEMA), members, remap, epoch=epoch
        )
        seen += edges
        got = _comps(current_components(members, remap))
        want = _comps(connected_components(spark.createDataFrame(seen, _SCHEMA)))
        assert got == want, f"prefix through batch {epoch}"
    assert got[6] == 1 and got[9] == 7  # the merge actually landed

    # replay of a committed epoch: both tables unchanged, output unchanged
    n_m, n_r = members.read().count(), remap.read().count()
    update_components_index(
        spark.createDataFrame(batches[-1], _SCHEMA), members, remap, epoch=3
    )
    assert members.read().count() == n_m and remap.read().count() == n_r
    assert _comps(current_components(members, remap)) == got


def test_components_compaction_bit_identical_and_stream_continues(spark, wh):
    members = ParquetTable(spark, f"{wh}/members")
    remap = ParquetTable(spark, f"{wh}/remap")
    edges = [[(1, 2), (5, 6)], [(2, 5)]]  # batch 2 merges them
    for epoch, e in enumerate(edges, start=1):
        update_components_index(
            spark.createDataFrame(e, _SCHEMA), members, remap, epoch=epoch
        )
    snap = _comps(current_components(members, remap))
    assert snap == {1: 1, 2: 1, 5: 1, 6: 1}
    assert remap.read().count() > 0

    compact_components(members, remap)
    assert _comps(current_components(members, remap)) == snap
    assert remap.read().count() == 0
    assert members.read().filter(F.col("_epoch").isNotNull()).count() == 0

    # a merge AFTER compaction still resolves against the folded base
    update_components_index(
        spark.createDataFrame([(0, 6), (8, 9)], _SCHEMA), members, remap, epoch=3
    )
    want = _comps(
        connected_components(
            spark.createDataFrame(
                [p for b in edges for p in b] + [(0, 6), (8, 9)], _SCHEMA
            )
        )
    )
    assert _comps(current_components(members, remap)) == want
    assert want[6] == 0  # new node 0 is the new minimum root


def test_leakage_safe_assignments_match_batch_query(spark, wh):
    """The maintained component index serves the SAME train/valid/test
    assignment as the from-scratch catalog leakage_safe_split — including
    for singleton documents the index never saw — after the batch query's
    edge set arrives incrementally in two halves."""
    import os

    from schwab_elt_etl_pipeline_spark.catalog.analytics11 import (
        _SPLIT_TAU,
        leakage_safe_split,
        ngram_jaccard_pairs,
    )
    from schwab_elt_etl_pipeline_spark.sources import load_table
    from schwab_elt_etl_pipeline_spark.streaming.components import (
        leakage_safe_assignments,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    members = ParquetTable(spark, f"{wh}/members")
    remap = ParquetTable(spark, f"{wh}/remap")

    # a never-built index degrades to all-singleton components
    docs = load_table(spark, sf, "documents")
    fresh = leakage_safe_assignments(docs.limit(5), members, remap).collect()
    assert all(r.component == r.doc_id for r in fresh)

    pairs = (
        ngram_jaccard_pairs(spark, sf)
        .filter(F.col("jac") >= _SPLIT_TAU)
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    half = F.col("a_id") % 2 == 0
    update_components_index(pairs.filter(half), members, remap, epoch=1)
    update_components_index(pairs.filter(~half), members, remap, epoch=2)

    got = {
        r.doc_id: (r.component, r.bucket, r.split)
        for r in leakage_safe_assignments(docs, members, remap).collect()
    }
    want = {
        r.doc_id: (r.component, r.bucket, r.split)
        for r in leakage_safe_split(spark, sf).collect()
    }
    assert got == want


def test_neardup_components_stream_matches_batch_chain(spark, wh):
    """foreachBatch drive: documents arrive in two file triggers; the
    maintained components equal the batch MinHash->verify->components chain
    over the full corpus (a cross-batch near-dup pair forces a probe hit,
    and a third copy in a later batch forces a component extension)."""
    import datetime as dt

    from schwab_elt_etl_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from schwab_elt_etl_pipeline_spark.streaming.components import (
        neardup_components_stream,
    )

    ts = dt.datetime(2024, 6, 17, 12, 0, tzinfo=dt.timezone.utc)
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about spark shuffles and parquet files"
    rows1 = [(0, base), (1, other)]
    rows2 = [(2, base + " extra"), (3, base)]  # both near-dup of doc 0
    schema = (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT, ingest_ts TIMESTAMP"
    )
    mk = lambda rows: spark.createDataFrame(
        [(i, t, "en", "s", len(t), ts) for i, t in rows], schema
    )
    src = f"{wh}/src"
    mk(rows1).coalesce(1).write.mode("append").parquet(src)
    mk(rows2).coalesce(1).write.mode("append").parquet(src)

    index = ParquetTable(spark, f"{wh}/bands")
    members = ParquetTable(spark, f"{wh}/members")
    remap = ParquetTable(spark, f"{wh}/remap")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = neardup_components_stream(
        stream, index, members, remap, f"{wh}/ck", min_jaccard=0.5
    )
    q.awaitTermination(300)

    union = mk(rows1 + rows2)
    edges = minhash_lsh_candidates(union, ngram=2, k=32, bands=16).filter(
        F.col("est_jaccard") >= 0.5
    )
    want = _comps(connected_components(edges))
    assert _comps(current_components(members, remap)) == want
    assert want and all(c == 0 for n, c in want.items())  # one dup cluster


def test_closure_maintained_incrementally_and_heals_after_crash(spark, wh):
    """The maintained closure table must (a) stay in sync with the remap
    merge events — one row per retired root, fully resolved, so resolution
    is one broadcast join with NO per-trigger CC — and (b) self-heal by
    re-deriving from remap when it is missing or stale (a crash between the
    remap append and the closure rewrite)."""
    from schwab_elt_etl_pipeline_spark.streaming.components import _closure_table

    members = ParquetTable(spark, f"{wh}/members")
    remap = ParquetTable(spark, f"{wh}/remap")
    # chain-merge so remap rows genuinely need transitive chasing:
    # {3,4} then {1,2} then 2-3 (retires 3) then 0-1 (retires 1 AND remaps 3)
    for epoch, edges in enumerate([[(3, 4)], [(1, 2)], [(2, 3)], [(0, 1)]]):
        update_components_index(
            spark.createDataFrame(edges, _SCHEMA), members, remap, epoch=epoch
        )
    ct = _closure_table(remap)
    assert ct.exists()
    closure = {r.root: r.comp for r in ct.read().collect()}
    assert closure == {4: 0, 3: 0, 2: 0, 1: 0}  # every retired root -> FINAL
    assert ct.read().count() == remap.read().count()
    want = _comps(current_components(members, remap))
    assert set(want.values()) == {0}

    # crash simulation: the process dies (freshness cache gone) and the
    # closure vanished -> reads heal from remap
    from schwab_elt_etl_pipeline_spark.streaming.components import _CLOSURE_FRESH

    _CLOSURE_FRESH.discard(remap.path)
    shutil.rmtree(ct.path, ignore_errors=True)
    assert _comps(current_components(members, remap)) == want
    assert {r.root: r.comp for r in _closure_table(remap).read().collect()} == closure

    # stale-closure simulation: crash after the remap append but before the
    # closure rewrite (row missing, count mismatch), fresh process -> heal
    ct2 = _closure_table(remap)
    ct2.overwrite_versioned(ct2.read().filter(F.col("root") != 3))
    _CLOSURE_FRESH.discard(remap.path)
    assert _comps(current_components(members, remap)) == want
