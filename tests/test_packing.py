"""FFD sequence packing: the per-shard higher-order-aggregate greedy must
equal the textbook sequential first-fit-decreasing bit-for-bit (the claim
the recursive-CTE oracle certifies on the catalog query), including the
empty-bin-state first step and new-bin opening."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from schwab_elt_etl_pipeline_spark.operators.packing import ffd_pack


def _py_ffd(docs, capacity):
    """(shard -> [(len, id)]) -> {id: bin} by sequential FFD."""
    out = {}
    for shard, ds in docs.items():
        ds = sorted(ds, key=lambda t: (-t[0], t[1]))
        rem = []
        for ln, did in ds:
            for i, r in enumerate(rem):
                if r >= ln:
                    rem[i] -= ln
                    out[did] = i + 1
                    break
            else:
                rem.append(capacity - ln)
                out[did] = len(rem)
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=40),
    n_shards=st.integers(min_value=1, max_value=3),
)
def test_ffd_pack_matches_sequential_reference(spark, lens, n_shards):
    cap = 100
    docs = {}
    rows = []
    for i, ln in enumerate(lens):
        shard = f"s{i % n_shards}"
        docs.setdefault(shard, []).append((ln, i))
        rows.append((i, shard, ln))
    df = spark.createDataFrame(rows, "doc_id long, source string, len long")
    got = {r.doc_id: r.bin for r in ffd_pack(df, capacity=cap).collect()}
    assert got == _py_ffd(docs, cap)


def test_ffd_keeps_docs_whole_and_respects_capacity(spark):
    rows = [(i, "s", ln) for i, ln in enumerate([60, 60, 50, 40, 30, 20, 10])]
    df = spark.createDataFrame(rows, "doc_id long, source string, len long")
    packed = ffd_pack(df, capacity=100).collect()
    fills = {}
    for r in packed:
        fills[r.bin] = fills.get(r.bin, 0) + r.len
    assert all(v <= 100 for v in fills.values())
    assert sum(fills.values()) == 270  # every doc packed exactly once, whole
    # FFD on these lengths: [60,40] [60,30,10] [50,20] = 3 bins
    assert len(fills) == 3
