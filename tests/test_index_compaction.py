"""Compaction for the epoch-stamped streaming state tables.

The contract under test, for every compaction/consolidation helper:
post-compaction READ results are bit-identical to pre-compaction, and a
replayed (checkpoint-committed) epoch still inserts zero rows through the
key-guarded ``insert_new``. The documented caveat — an UNCOMMITTED epoch's
per-batch output is not reproduced after its stamps are folded — is the
reason the helpers are a post-checkpoint cadence chore, not part of the
per-trigger path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.corpus import (
    compact_index,
    update_gram_index,
    update_pq_index,
)
from schwab_elt_etl_pipeline_spark.streaming.acf_stream import (
    acf_from_moments,
    consolidate_moments,
    consolidate_tails,
    current_moments,
    update_acf_moments,
)
from schwab_elt_etl_pipeline_spark.streaming.markov_stream import (
    consolidate_cells,
    current_cells,
    transition_probs,
    update_transition_cells,
)


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="compact_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# fingerprint-keyed index family (gram index as the representative)
# ---------------------------------------------------------------------------


def test_gram_index_compaction_bit_identical_probe(spark, wh):
    """After compact_index, a later batch's novelty output is bit-identical
    to what an uncompacted twin index produces, a replayed committed epoch
    inserts zero rows, and superseded versions are vacuumed."""
    b1 = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c x y z")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2, "c d e q r s"), (3, "fresh tokens only here")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(4, "a b c q r s brand new tail")], "doc_id long, text string"
    )
    get = lambda df: {
        r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty"]) for r in df.collect()
    }

    compacted = ParquetTable(spark, f"{wh}/grams_c", cluster_by=("gh",))
    twin = ParquetTable(spark, f"{wh}/grams_t", cluster_by=("gh",))
    for idx in (compacted, twin):
        update_gram_index(b1, idx, n=3, epoch=1)
        out2 = get(update_gram_index(b2, idx, n=3, epoch=2))

    rows_before = {
        (r["gh"], r["first_doc_id"]) for r in compacted.read().collect()
    }
    compact_index(compacted, keep_versions=1)
    # content identical modulo the folded epoch stamps
    assert {
        (r["gh"], r["first_doc_id"]) for r in compacted.read().collect()
    } == rows_before
    assert compacted.read().filter(F.col("_epoch").isNotNull()).count() == 0
    # superseded versions are gone (seed + 1 append epoch + compaction = v1
    # and v2 existed; only the compacted current version survives)
    versions = [d for d in os.listdir(f"{wh}/grams_c") if d.startswith("_v")]
    assert len(versions) == 1

    # a NEW batch probes identically against compacted vs uncompacted state
    assert get(update_gram_index(b3, compacted, n=3, epoch=3)) == get(
        update_gram_index(b3, twin, n=3, epoch=3)
    )

    # replay of a committed epoch after compaction: key guard holds
    n = compacted.read().count()
    update_gram_index(b2, compacted, n=3, epoch=2)
    assert compacted.read().count() == n


def test_minhash_index_compaction_pure_rewrite(spark, wh):
    """The minhash band index has NO _epoch column (id-keyed idempotence);
    compact_index must be a pure clustered rewrite — identical rows, and a
    later batch probes identically against compacted vs uncompacted state."""
    from schwab_elt_etl_pipeline_spark.streaming.corpus import update_minhash_index

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    b1 = mk([(0, "the quick brown fox jumps over the lazy dog today"),
             (1, "completely different content about spark and parquet")])
    b2 = mk([(2, "the quick brown fox jumps over the lazy dog today ok")])
    compacted = ParquetTable(spark, f"{wh}/mh_c", cluster_by=("bucket",))
    twin = ParquetTable(spark, f"{wh}/mh_t", cluster_by=("bucket",))
    for idx in (compacted, twin):
        update_minhash_index(b1, idx)
    rows_before = {
        (r["id"], r["band"], r["bucket"]) for r in compacted.read().collect()
    }
    compact_index(compacted)
    assert {
        (r["id"], r["band"], r["bucket"]) for r in compacted.read().collect()
    } == rows_before
    get = lambda df: {(r["batch_id"], r["index_id"]) for r in df.collect()}
    assert get(update_minhash_index(b2, compacted)) == get(
        update_minhash_index(b2, twin)
    )


def test_pq_index_query_bit_identical_after_compaction(spark, wh):
    """ADC shortlists computed against the code table are bit-identical
    before and after compact_index (codes unchanged, stamps folded)."""
    import numpy as np

    from schwab_elt_etl_pipeline_spark.operators.similarity import pq_query_index

    rng = np.random.default_rng(13)
    base_a = rng.standard_normal(8) * 3

    def emb(ids, base):
        rows = [
            (int(i), [float(x) for x in (base + 0.01 * rng.standard_normal(8))])
            for i in ids
        ]
        return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    books = ParquetTable(spark, f"{wh}/pq_books")
    codes = ParquetTable(spark, f"{wh}/pq_codes")
    update_pq_index(emb(range(0, 6), base_a), books, codes, m=4, k_codes=4, epoch=0)
    update_pq_index(emb(range(6, 10), -base_a), books, codes, m=4, k_codes=4, epoch=1)

    probe = emb([100, 101], base_a)
    key = lambda df: sorted(
        (r["q_id"], r["vec_id"], r["adc_d2"]) for r in df.collect()
    )
    before = key(pq_query_index(books, codes, probe, 3))
    compact_index(codes)
    after = key(pq_query_index(books, codes, probe, 3))
    assert before == after
    assert codes.read().filter(F.col("_epoch").isNotNull()).count() == 0


# ---------------------------------------------------------------------------
# epoch-DELTA state tables (acf moments/tails, markov cells)
# ---------------------------------------------------------------------------

_EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"


def _ev(evid, ts_s, user, val):
    return (evid, datetime(2024, 1, 1, 0, 0, ts_s), user, val)


def test_acf_consolidation_bit_identical_and_stream_continues(spark, wh):
    """consolidate_tails/consolidate_moments preserve acf_from_moments
    bit-for-bit, bound the tails table to users x K rows, keep the on-disk
    column types stable, and later epochs keep exact batch parity."""
    tails = ParquetTable(spark, f"{wh}/tails")
    moments = ParquetTable(spark, f"{wh}/moments")
    rows = [_ev(i, i, 7, float(v)) for i, v in enumerate([1, 5, 2, 8, 3, 9, 4, 6])]
    b1 = spark.createDataFrame(rows[:3], _EV_SCHEMA)
    b2 = spark.createDataFrame(rows[3:6], _EV_SCHEMA)
    b3 = spark.createDataFrame(rows[6:], _EV_SCHEMA)
    update_acf_moments(b1, tails, moments, lags=3, epoch=1)
    update_acf_moments(b2, tails, moments, lags=3, epoch=2)

    acf = lambda: {
        (r.user_id, r.lag): (r.n_pairs, r.acf)
        for r in acf_from_moments(current_moments(moments)).collect()
    }
    snap = acf()
    types_before = [
        (f.name, f.dataType.simpleString()) for f in moments.read().schema.fields
    ]
    consolidate_tails(tails, lags=3)
    consolidate_moments(moments)
    assert acf() == snap
    # schema must not widen, or later epoch appends would drift the table
    assert [
        (f.name, f.dataType.simpleString()) for f in moments.read().schema.fields
    ] == types_before
    assert tails.read().count() == 3  # one user x K=3 tail rows
    assert moments.read().filter(F.col("_epoch").isNotNull()).count() == 0

    # the stream continues: epoch 3 on consolidated state == one-shot batch
    update_acf_moments(b3, tails, moments, lags=3, epoch=3)
    one_t = ParquetTable(spark, f"{wh}/tails1")
    one_m = ParquetTable(spark, f"{wh}/moments1")
    update_acf_moments(
        spark.createDataFrame(rows, _EV_SCHEMA), one_t, one_m, lags=3, epoch=1
    )
    want = {
        (r.user_id, r.lag): (r.n_pairs, r.acf)
        for r in acf_from_moments(current_moments(one_m)).collect()
    }
    assert acf() == want


_MK_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def test_markov_consolidate_cells_bit_identical(spark, wh):
    """consolidate_cells preserves the transition matrix bit-for-bit, keeps
    the cnt column type stable, and later epochs keep boundary stitching."""
    cells = ParquetTable(spark, f"{wh}/cells")
    last_seen = ParquetTable(spark, f"{wh}/last_seen")
    seq = ["a", "b", "a", "c", "b", "a"]
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i), 7, t) for i, t in enumerate(seq)
    ]
    b1 = spark.createDataFrame(rows[:3], _MK_SCHEMA)
    b2 = spark.createDataFrame(rows[3:5], _MK_SCHEMA)
    b3 = spark.createDataFrame(rows[5:], _MK_SCHEMA)
    update_transition_cells(b1, cells, last_seen, epoch=1)
    update_transition_cells(b2, cells, last_seen, epoch=2)

    probs = lambda c: {
        (r.prev, r.next): (r.cnt, r.prob)
        for r in transition_probs(current_cells(c)).collect()
    }
    snap = probs(cells)
    cnt_type = dict(
        (f.name, f.dataType.simpleString()) for f in cells.read().schema.fields
    )["cnt"]
    consolidate_cells(cells)
    assert probs(cells) == snap
    assert dict(
        (f.name, f.dataType.simpleString()) for f in cells.read().schema.fields
    )["cnt"] == cnt_type
    assert cells.read().filter(F.col("_epoch").isNotNull()).count() == 0

    # boundary pair b->a from batch 2's last event still stitches
    update_transition_cells(b3, cells, last_seen, epoch=3)
    one_c = ParquetTable(spark, f"{wh}/cells1")
    one_l = ParquetTable(spark, f"{wh}/ls1")
    update_transition_cells(
        spark.createDataFrame(rows, _MK_SCHEMA), one_c, one_l, epoch=1
    )
    assert probs(cells) == probs(one_c)
