"""Regenerate LASTGREEN.json from the driver's CORRECTNESS_r*.json artifacts.

LASTGREEN.json maps catalog query name -> the latest round in which the
driver's correctness gate verified it green:

- strong green: ``hash_match == true`` (rows + schema + order-insensitive
  value hash against the DuckDB oracle), or
- weak green: ``err == "no_oracle"`` with a non-null row count (the driver's
  rows-only check for genuinely non-SQL-expressible operators).

``catalog.all_specs()`` orders the registry stalest-first from this file so
the driver's 50-query sample window always re-verifies the oldest cohort
(never-sampled queries first, then ascending last-green round). Run this
tool after each round's CORRECTNESS file lands, commit the JSON, and the
next round's sample is provably the stalest 50 — no hand-curated lists.

Usage: python tools_lastgreen.py [--check]
  --check  exit non-zero if LASTGREEN.json is stale instead of rewriting it.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(ROOT, "LASTGREEN.json")


def _is_green(rec: dict) -> bool:
    if rec.get("hash_match") is True:
        return True
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def compute() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base.split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            continue
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if isinstance(rec, dict) and _is_green(rec):
                last[name] = max(last.get(name, 0), rnd)
    return dict(sorted(last.items()))


def main() -> int:
    fresh = compute()
    if "--check" in sys.argv[1:]:
        try:
            with open(OUT) as fh:
                current = json.load(fh)
        except (OSError, json.JSONDecodeError):
            current = None
        if current != fresh:
            print("LASTGREEN.json is stale — rerun: python tools_lastgreen.py")
            return 1
        print(f"LASTGREEN.json up to date ({len(fresh)} queries)")
        return 0
    with open(OUT, "w") as fh:
        json.dump(fresh, fh, indent=1, sort_keys=True)
        fh.write("\n")
    rounds: dict[int, int] = {}
    for rnd in fresh.values():
        rounds[rnd] = rounds.get(rnd, 0) + 1
    print(f"wrote {OUT}: {len(fresh)} queries; last-green counts {rounds}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
