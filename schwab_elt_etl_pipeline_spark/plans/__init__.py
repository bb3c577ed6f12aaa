"""Medallion pipeline builders — pure DataFrame in / DataFrame out.

Each module re-expresses one reference stored-procedure chain as a declarative
Spark plan (SURVEY §3): ``silver`` (quotes → OPT/OPTM), ``gold``
(OPTM → VERT/VERT_TS), ``ohlc`` (staging → HISTORIC promote), ``orders_plan``
(nested order docs → flat graph → TRANSACTIONS), ``chains`` (chain snapshots).
"""
