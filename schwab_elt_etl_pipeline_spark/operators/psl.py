"""Public-Suffix-List registrable-domain extraction.

Upgrades the heuristic PSL core in ``operators/domains.py``
(:func:`~schwab_elt_etl_pipeline_spark.operators.domains.registrable_domain`,
last-2/last-3 labels) to the REAL public-suffix algorithm driven by a rule
table (publicsuffix.org semantics): the prevailing rule is the matching
exception rule if any, else the matching rule with the most labels, else
the implicit ``*`` default; the public suffix is the matched labels (one
more for a wildcard match, one fewer for an exception), and the
registrable domain is the public suffix plus one label.

Two lookup paths, one rule object, identical verdicts:

- :func:`registrable_domain_psl` — a pure Column EXPRESSION: the rule set
  is compiled into grouped ``isin`` tests (one per label-count, longest
  first; Catalyst lowers large lists to an ``InSet`` hash probe, so the
  per-row cost is O(1) even with the full ~9k-rule list — the real cost
  of growing the list is plan/literal size, shipped once per stage, not
  per row). Zero joins, zero shuffles — the lookup runs inside the scan
  stage, and the DuckDB oracle twin (:func:`psl_sql_expr`) is emitted
  from the SAME compiled groups so the two dialects cannot drift. This is
  the hot-path default; the committed subset lives at
  ``data/public_suffix_subset.dat``.
- :func:`with_registrable_domain_psl` — the rules-as-DATA path: when the
  list arrives as a refreshed table (daily dump in parquet) and replanning
  with new literals per refresh is unwanted, candidate suffixes of each
  host (≤ longest-rule+1 rows, bounded by the rule table, NOT host
  length) probe the broadcast rule table through ONE equi-join, and the
  prevailing rule is a per-host max over an (is_exception, labels)
  struct. Cost over the expression path, stated honestly: the per-host
  fold combines map-side to one small row per host, then pays one
  row-key exchange plus the join-back of the corpus rows on the same
  key — use it when rule-refresh logistics beat two linear exchanges.
  Property-tested equal to the expression path on every committed rule
  family.

Hosts that ARE a public suffix themselves (``co.uk``, ``github.io``) have
no registrable domain — both paths yield NULL, and callers that want the
heuristic's pass-through behavior coalesce explicitly. Unknown TLDs take
the implicit ``*`` default rule (last two labels), matching the PSL spec;
single-label hosts (intranet names) yield NULL under the default rule.

The parser reads the list's interchange format (comments, sections,
``*.``/``!`` rules) so a production dump drops in unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "PslRules",
    "load_psl_rules",
    "default_psl_rules",
    "registrable_domain_psl",
    "with_registrable_domain_psl",
    "psl_rules_df",
    "psl_sql_expr",
]

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_subset.dat",
)


@dataclass(frozen=True)
class PslRules:
    """Parsed rule set: plain suffixes, wildcard BASES (the labels after
    ``*.``), and exception NAMES (the labels after ``!``)."""

    exact: frozenset[str] = field(default_factory=frozenset)
    wildcard: frozenset[str] = field(default_factory=frozenset)
    exception: frozenset[str] = field(default_factory=frozenset)

    def by_len(self, which: frozenset[str]) -> dict[int, list[str]]:
        """Group a rule family by label count (sorted for determinism)."""
        out: dict[int, list[str]] = {}
        for s in sorted(which):
            out.setdefault(s.count(".") + 1, []).append(s)
        return out

    @property
    def max_match_labels(self) -> int:
        """Longest suffix any rule can match, in labels (wildcards match
        one MORE label than their base)."""
        lens = [s.count(".") + 1 for s in self.exact]
        lens += [s.count(".") + 2 for s in self.wildcard]
        lens += [s.count(".") + 1 for s in self.exception]
        return max(lens, default=1)


def load_psl_rules(path: str = _DEFAULT_PATH) -> PslRules:
    """Parse a public-suffix list file (the publicsuffix.org interchange
    format: ``//`` comments, blank lines, ``*.`` wildcard rules, ``!``
    exception rules)."""
    exact, wild, exc = set(), set(), set()
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                exc.add(line[1:])
            elif line.startswith("*."):
                wild.add(line[2:])
            else:
                exact.add(line)
    return PslRules(frozenset(exact), frozenset(wild), frozenset(exc))


_DEFAULT_RULES: PslRules | None = None


def default_psl_rules() -> PslRules:
    """The committed subset, parsed once per process."""
    global _DEFAULT_RULES
    if _DEFAULT_RULES is None:
        _DEFAULT_RULES = load_psl_rules()
    return _DEFAULT_RULES


def _suffix(labels: Column, n: Column, k: Column | int) -> Column:
    """The last ``k`` labels of the host, joined. The start clamps to 1:
    ``slice`` evaluates EAGERLY under a ``when`` guard (Spark conditionals
    don't short-circuit subexpressions), and a non-positive start is a
    runtime error — with the clamp a too-short host yields the whole host,
    which has fewer dots than any k-label rule and can never spuriously
    match (callers still guard with ``n >= k`` for clarity)."""
    k = F.lit(k) if isinstance(k, int) else k
    return F.array_join(
        F.slice(labels, F.greatest(n - k + F.lit(1), F.lit(1)), k), "."
    )


def _ps_len_expr(labels: Column, n: Column, rules: PslRules) -> Column:
    """Public-suffix label count for a host, as one CASE chain: exception
    rules first (longest first), then normal/wildcard matches longest
    first, then the implicit ``*`` default (1)."""
    chain: list[tuple[Column, int]] = []
    for k, names in sorted(
        rules.by_len(rules.exception).items(), reverse=True
    ):
        chain.append(((n >= k) & _suffix(labels, n, k).isin(*names), k - 1))
    matchers: dict[int, list[Column]] = {}
    for k, names in rules.by_len(rules.exact).items():
        matchers.setdefault(k, []).append(
            (n >= k) & _suffix(labels, n, k).isin(*names)
        )
    for k, names in rules.by_len(rules.wildcard).items():
        # a wildcard base of k labels makes any (k+1)-label suffix public
        matchers.setdefault(k + 1, []).append(
            (n >= k + 1) & _suffix(labels, n, k).isin(*names)
        )
    for k in sorted(matchers, reverse=True):
        cond = matchers[k][0]
        for c in matchers[k][1:]:
            cond = cond | c
        chain.append((cond, k))
    out: Column = F.lit(1)
    for cond, val in reversed(chain):
        out = F.when(cond, F.lit(val)).otherwise(out)
    return out


def registrable_domain_psl(
    host: Column | str, rules: PslRules | None = None
) -> Column:
    """Registrable domain of a (lowercased) host per the public-suffix
    algorithm — expression path (see module docstring). NULL when the
    host IS a public suffix or is a single unknown label."""
    rules = rules or default_psl_rules()
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = _ps_len_expr(labels, n, rules)
    return F.when(n >= ps + 1, _suffix(labels, n, ps + F.lit(1)))


def psl_sql_expr(host_expr: str, rules: PslRules | None = None) -> str:
    """DuckDB twin of :func:`registrable_domain_psl`, emitted from the
    SAME rule groups (the textnorm/pii anti-drift discipline). Uses
    string_split + list slicing; NULL in the same cases."""
    rules = rules or default_psl_rules()

    def q(s: str) -> str:
        return s.replace("'", "''")

    def sfx(k: str | int) -> str:
        return f"array_to_string(l[-({k}):], '.')"

    branches: list[str] = []
    for k, names in sorted(
        rules.by_len(rules.exception).items(), reverse=True
    ):
        lst = ", ".join(f"'{q(s)}'" for s in names)
        branches.append(f"WHEN n >= {k} AND {sfx(k)} IN ({lst}) THEN {k - 1}")
    matchers: dict[int, list[str]] = {}
    for k, names in rules.by_len(rules.exact).items():
        lst = ", ".join(f"'{q(s)}'" for s in names)
        matchers.setdefault(k, []).append(f"(n >= {k} AND {sfx(k)} IN ({lst}))")
    for k, names in rules.by_len(rules.wildcard).items():
        lst = ", ".join(f"'{q(s)}'" for s in names)
        matchers.setdefault(k + 1, []).append(
            f"(n >= {k + 1} AND {sfx(k)} IN ({lst}))"
        )
    for k in sorted(matchers, reverse=True):
        branches.append(f"WHEN {' OR '.join(matchers[k])} THEN {k}")
    case = "CASE " + " ".join(branches) + " ELSE 1 END"
    return (
        f"(SELECT CASE WHEN n >= ps + 1 THEN array_to_string(l[-(ps+1):], '.') END "
        f"FROM (SELECT l, len(l) AS n, ({case}) AS ps "
        f"FROM (SELECT string_split(({host_expr}), '.') AS l)))"
    )


def psl_rules_df(spark: SparkSession, rules: PslRules | None = None) -> DataFrame:
    """The rule set as a (suffix, kind) table for the broadcast-join path.
    ``suffix`` is the rule's literal labels (wildcards store their BASE);
    ``kind`` ∈ {exact, wildcard, exception}."""
    rules = rules or default_psl_rules()
    rows = (
        [(s, "exact") for s in sorted(rules.exact)]
        + [(s, "wildcard") for s in sorted(rules.wildcard)]
        + [(s, "exception") for s in sorted(rules.exception)]
    )
    return spark.createDataFrame(rows, "suffix string, kind string")


def with_registrable_domain_psl(
    df: DataFrame,
    rules_df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    max_match_labels: int = 5,
) -> DataFrame:
    """Broadcast-join path (the full-PSL 100 TB shape; see module
    docstring): adds ``out_col`` to ``df``.

    Shape: each row fans out into its candidate suffixes (≤
    ``max_match_labels`` + 1 rows — bounded by the longest rule, NOT host
    length), the candidates probe the broadcast rule table with ONE
    equi-join on the suffix string, and the prevailing rule is a per-row
    max over a (is_exception, matched_labels) struct — map-side-combinable,
    grouped on ``df``'s own grain so no corpus-wide key ever shuffles by
    value. ``max_match_labels`` must be ≥ the rule table's
    :attr:`PslRules.max_match_labels` (assert with the parsed rules when
    loading a production dump)."""
    marked = df.withColumn(
        "_psl_row", F.monotonically_increasing_id()
    ).withColumn("_labels", F.split(F.col(host_col), r"\."))
    n = F.size("_labels")
    # candidate suffix lengths 1..min(n, max+1); k = max+1 is needed so a
    # max-length WILDCARD rule (base of max labels) can still match k+1
    cand = marked.select(
        "_psl_row",
        "_labels",
        n.alias("_n"),
        F.explode(
            F.sequence(F.lit(1), F.least(n, F.lit(max_match_labels + 1)))
        ).alias("_k"),
    ).select(
        "_psl_row",
        "_n",
        "_k",
        F.array_join(
            F.slice("_labels", F.col("_n") - F.col("_k") + 1, F.col("_k")), "."
        ).alias("_sfx"),
    )
    r = rules_df.select(
        F.col("suffix").alias("_sfx"),
        F.col("kind").alias("_kind"),
        (F.size(F.split(F.col("suffix"), r"\.")) ).alias("_rlen"),
    )
    hits = cand.join(F.broadcast(r), "_sfx").select(
        "_psl_row",
        "_n",
        # matched public-suffix length: exact = rule labels; wildcard base
        # of _rlen labels certifies a (_rlen+1)-label suffix — valid only
        # when the host actually HAS one more label to match the '*';
        # exception = rule labels - 1. Exceptions prevail: sort first on
        # the exception bit, then on matched length.
        F.when(F.col("_kind") == "exception", F.col("_k") - 1)
        .when(
            (F.col("_kind") == "wildcard") & (F.col("_n") >= F.col("_k") + 1),
            F.col("_k") + 1,
        )
        .when(F.col("_kind") == "exact", F.col("_k"))
        .alias("_ps"),
        (F.col("_kind") == "exception").cast("int").alias("_exc"),
    ).where(F.col("_ps").isNotNull())
    best = hits.groupBy("_psl_row").agg(
        F.max(F.struct("_exc", F.col("_ps").alias("_v"))).alias("_b")
    ).select("_psl_row", F.col("_b._v").alias("_ps"))
    n_out = F.size("_labels")
    out = (
        marked.join(best, "_psl_row", "left")
        .withColumn("_ps", F.coalesce(F.col("_ps"), F.lit(1)))
        .withColumn(
            out_col,
            F.when(
                n_out >= F.col("_ps") + 1,
                _suffix(F.col("_labels"), n_out, F.col("_ps") + F.lit(1)),
            ),
        )
    )
    return out.drop("_psl_row", "_labels", "_ps")
