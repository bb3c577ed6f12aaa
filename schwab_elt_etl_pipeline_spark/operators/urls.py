"""URL canonicalization + exact URL dedup — the web-corpus front door.

A crawl-derived training corpus keys provenance on URLs, and the same page
arrives under many spellings: mixed-case hosts, ``www.`` prefixes, default
ports, trailing slashes, tracking parameters (``utm_*``/``ref``/click ids),
fragments, and shuffled query-parameter order. Canonicalizing before any
doc-level dedup collapses those spellings so URL-exact dedup (the cheapest
dedup tier, ahead of MinHash/SimHash content passes) actually fires.

Spark-first shape: everything is built-in expression work on ``parse_url``
(JVM-side, whole-stage-codegen friendly) — host/path/query extraction never
leaves the executors, and the dup grouping is ONE groupBy on the canonical
string. No UDFs, no driver round-trips; linear in the corpus at any scale.

Reference parity note: the reference keys rows on exchange-symbol strings
(tools/schwab.py symbol normalization); URL canonicalization is the
web-corpus analogue the LLM-pipeline brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one alternation, applied per query-parameter: the industry-standard
# tracking families ((=|$) so a value-less tracker like '?utm_source' is
# stripped too). Deliberately NOT stripped: generic content-keying params
# like 'id' or 'page' — many real sites key distinct pages on ?id=, so
# stripping them would be wrongful dedup (data loss), not hygiene.
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid|msclkid)(=|$)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column.

    Rules (each deterministic, all expressed with built-ins):

    - scheme normalized to ``https``
    - host lowercased, leading ``www.`` labels stripped (only while at
      least two labels remain — stripping the registrable domain out of a
      ``www.com``-style apex would merge unrelated ``www.*`` hosts),
      DEFAULT ports dropped (80/443 — either is "the default" once the
      scheme normalizes to https); a non-default port is KEPT, because
      ``ex.com:8080`` and ``ex.com`` are routinely different services
    - trailing ``/`` stripped from the path
    - fragment dropped (``parse_url QUERY`` already excludes it)
    - tracking parameters removed (:data:`TRACKING_PARAM_RE`)
    - surviving query parameters SORTED so parameter order can't split a
      dup group

    Malformed or NULL URLs canonicalize to NULL (``try_parse_url`` — the
    plain ``parse_url`` RAISES under ANSI mode, so one bad URL in a 100 TB
    crawl would kill the whole job; a NULL group the caller can drop or
    quarantine is the operator-grade behavior). A pathless URL keeps an
    empty path (``coalesce`` — concat would otherwise null the entire
    canonical form). Scheme-less spellings — ``ex.com/a`` and the
    protocol-relative ``//ex.com/a``, both ubiquitous in crawl data — get
    the https scheme defaulted BEFORE parsing rather than being
    quarantined wholesale (parse_url needs a scheme to find the host).
    """
    url = F.col(url) if isinstance(url, str) else url
    # ONLY http/https parse as-is. Every other scheme quarantines to NULL
    # outright — including authority-carrying ones (ftp://, ws://, ...)
    # that WOULD parse a real host and masquerade as the https page at the
    # same path, silently cross-protocol-deduping distinct resources. The
    # scheme charset includes '.', so a scheme-less 'host:port/...'
    # spelling is syntactically a scheme and quarantines too — the
    # RFC 3986 ambiguity, resolved conservatively.
    url = (
        F.when(url.rlike(r"(?i)^https?:"), url)
        .when(
            url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"),
            F.lit(None).cast("string"),
        )
        .when(url.startswith("//"), F.concat(F.lit("https:"), url))
        .otherwise(F.concat(F.lit("https://"), url))
    )
    # (www\.)+ and /+$: strip ALL leading www labels / trailing slashes in
    # one pass — a single-strip rule would make the canonical form a
    # non-fixpoint ('www.www.x' or 'a//'), so re-canonicalizing an already
    # canonical URL could land on a DIFFERENT index key. The lookahead
    # requires a dotted label to SURVIVE the strip, so a host that IS a
    # www domain ('www.com') keeps its registrable name instead of
    # degenerating to an invalid single-label host.
    host = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))),
        r"^(www\.)+(?=[^.]+\.)",
        "",
    )
    # parse_url has no PORT part; the port rides at the tail of AUTHORITY
    # ([userinfo@]host[:port]), AFTER any userinfo (strip to the last '@'
    # first so 'user:pw@host' is never mistaken for a port). Explicit
    # port-tail policy (each case decided, none silent):
    #   - ':80'/':443' (and ':080' etc — leading zeros fold into the
    #     digits group) drop as https defaults; 'http://h:443' therefore
    #     folds into 'https://h' — DELIBERATE: once the scheme normalizes
    #     to https, 443 is "the" default, and http-on-443 in crawl data is
    #     overwhelmingly just a spelled-out TLS endpoint
    #   - any other port in [1, 65535] is a distinct service and stays
    #   - a bare ':' (empty port) means "the default" per RFC 3986 and
    #     browsers alike: dropped, NOT malformed
    #   - ':0', ports > 65535, and non-numeric tails (':8a') are
    #     unroutable/malformed: the URL QUARANTINES to NULL like any other
    #     parse failure (silently merging 'h:8a/x' with 'h/x' would
    #     wrongly dedup distinct junk spellings)
    hostport = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("AUTHORITY")), F.lit("")),
        r"^.*@",
        "",
    )
    port = F.regexp_extract(hostport, r":0*(\d+)$", 1)
    port_tail = F.regexp_extract(hostport, r":([^:\]]*)$", 1)
    has_port_tail = hostport.rlike(r":[^:\]]*$")
    # try_cast, not cast: under ANSI a 30-digit "port" would otherwise be
    # a hard overflow error instead of a quarantine
    pnum = port.try_cast("long")
    bad_port = (
        has_port_tail
        & (port_tail != "")
        & ~(pnum.isNotNull() & (pnum >= 1) & (pnum <= 65535))
    )
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    params = F.filter(
        F.split(
            F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"
        ),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.when(bad_port, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("https://"),
            host,
            F.when(
                (port != "") & ~port.isin("80", "443"),
                F.concat(F.lit(":"), port),
            ).otherwise(F.lit("")),
            path,
            F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
                F.lit("")
            ),
        )
    )


def url_dup_groups(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dup groups under URL canonicalization: one row per canonical
    URL with the group size and the keeper (lowest id — the deterministic
    keep-first rule every exact-dedup operator in this repo uses).

    Output: (canonical_url, n_docs, first_doc). One groupBy shuffle on the
    canonical string; at 100 TB this partitions by URL hash with no skew
    beyond genuinely mega-duplicated pages (which AQE splits).

    Malformed URLs (NULL canonical) are EXCLUDED from the groups: a crowd
    of distinct unparseable URLs is not a dup group, and returning it as
    one row with a real keeper id would make a keep-first consumer delete
    unrelated documents. Quarantine malformed rows upstream if they need
    accounting.
    """
    return (
        docs.select(
            canonical_url(url_col).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_id").alias("first_doc"),
        )
    )
