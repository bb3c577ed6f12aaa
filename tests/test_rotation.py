"""Mechanical sample-rotation contract (VERDICT r6 directive #2).

The driver's correctness gate samples the FIRST 50 registry entries each
round. ``catalog.all_specs()`` orders the registry from the committed
LASTGREEN.json (query -> last driver-green round): never-sampled queries
first, then ascending last-green round, ties in module order. These tests
pin that the committed JSON is in sync with the CORRECTNESS artifacts and
that the head of the registry is provably the stalest cohort.
"""

from __future__ import annotations

import json
from pathlib import Path

from schwab_elt_etl_pipeline_spark.catalog import _lastgreen, all_specs

ROOT = Path(__file__).resolve().parents[1]
WINDOW = 50


def test_lastgreen_file_matches_correctness_artifacts():
    import tools_lastgreen

    committed = json.loads((ROOT / "LASTGREEN.json").read_text())
    assert committed == tools_lastgreen.compute(), (
        "LASTGREEN.json stale — rerun: python tools_lastgreen.py"
    )


def test_sample_window_is_the_stalest_cohort():
    lg = _lastgreen()
    specs = all_specs()
    ranks = [lg.get(s.name, -1) for s in specs]
    # Never-sampled first, then ascending last-green round.
    assert ranks == sorted(ranks)
    # Nothing outside the window is staler than anything inside it.
    assert max(ranks[:WINDOW]) <= min(ranks[WINDOW:])


def test_every_catalog_query_has_been_green_or_is_new():
    """Queries absent from LASTGREEN must be new this round (they sort to the
    head and get driver-sampled next); known queries carry a positive round."""
    lg = _lastgreen()
    assert lg, "LASTGREEN.json missing or empty at repo root"
    assert all(r >= 1 for r in lg.values())
    known = set(lg)
    names = [s.name for s in all_specs()]
    new = [n for n in names if n not in known]
    # New queries must occupy the very head of the registry (rank -1).
    assert names[: len(new)] == new
