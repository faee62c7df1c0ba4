"""URL hygiene — the web-corpus curation steps that run BEFORE any text
operator sees a document: canonicalize the URL, collapse URL-level
duplicates (the cheapest dedup a crawl gets — C4 and RefinedWeb both
dedup by URL before touching content), and drop blocklisted domains.

Everything here is a pure Column expression chain (map-only, whole-stage
codegen, zero shuffles) except the dedup itself, which is the standard
one-shuffle min-per-key aggregate.  The expression chain deliberately
avoids regex-replacement BACKREFERENCES — Spark spells them ``$1`` and
DuckDB ``\\1``, so any rule that needs one cannot be oracle-replicated
verbatim; every rule below is a backref-free pattern deletion or a
literal substitution, which both engines execute identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped by normalize_url: the common cross-site
# analytics keys (the public "UTM + click-id" set).  Alternation compiles
# to one DFA pass in both engines.
TRACKING_PARAMS = "utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref"

# Multi-part public suffixes for the registered-domain approximation.
# This is NOT the full Public Suffix List (thousands of entries, updated
# monthly) — it is the documented approximation: two-label suffixes from
# the PSL's high-traffic head, else "last two labels".  At 100 TB the
# real PSL would ship as a broadcast lookup table joined on the candidate
# suffix; the expression form keeps the operator dependency-free and the
# oracle single-statement.
_MULTIPART_TLDS = "co|com|org|net|ac|gov|edu|mil|sch"
# a host ending in a two-label public suffix, e.g. "…example.co.uk"
_SUFFIX2_RE = rf"(?:{_MULTIPART_TLDS})\.[^.]+$"
_MULTIPART_RE = rf"[^.]+\.{_SUFFIX2_RE}"

# The normalization chain as shared (pattern, replacement) constants —
# normalize_url applies them via Spark regexp_replace, and
# normalize_url_oracle_sql emits the SAME patterns as DuckDB
# regexp_replace(..., 'g'), so the two spellings cannot drift.  Every
# pattern is Java-regex ∩ RE2 (no backrefs, no lookaround) and every
# replacement is backref-free.
#
# Authority rules apply ONLY to the extracted scheme://authority prefix
# — never to the whole URL — so path/query content that merely LOOKS
# like an authority artifact ("/a:80/b", "?to=https://www.x.com") is
# untouched (a whole-string ":80/" rule would silently collapse two
# distinct documents into one url_norm).
_P_PREFIX = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
_AUTH_RULES: list[tuple[str, str]] = [
    # userinfo never affects the resource: "user@spam.com" IS spam.com
    # (and would otherwise bypass the domain blocklist)
    (r"://[^/?#@]*@", "://"),
    (r"(:80|:443)$", ""),  # default ports ($ = end of authority)
    (r"\.$", ""),  # trailing-dot FQDN ("spam.com." IS spam.com)
]
# www-strip is guarded (applied only when the host has a further dotted
# label, via _WWW_GUARD) so a host whose registrable domain IS
# "www.<tld>" (www.com exists) survives.
_WWW_GUARD = r"://www\.[^.]+\."
_WWW_RULE: tuple[str, str] = (r"://www\.", "://")
# rules over the reassembled URL (the prefix regex excludes /?#, so
# these only ever touch path/query/fragment)
_NORM_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),  # fragment never reaches the server; drop first
    # tracking params, three backref-free cases: non-leading; leading
    # followed by a kept param (the '?' survives); leading and alone
    (rf"&(?:{TRACKING_PARAMS})=[^&#]*", ""),
    (rf"\?(?:{TRACKING_PARAMS})=[^&#]*&", "?"),
    (rf"\?(?:{TRACKING_PARAMS})=[^&#]*$", ""),
    # trailing slash at the path/query boundary ("/p/?q" ≡ "/p?q"); a raw
    # '?' later in a query is legal but should be percent-encoded — this
    # documented rule assumes it is
    (r"/\?", "?"),
    (r"\?$", ""),  # an emptied query marker
    (r"/$", ""),  # one trailing slash
]


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme://host, strip ``www.``, default
    ports, fragments, tracking parameters, empty queries and one trailing
    slash.  NULL in → NULL out.  Each step is order-dependent and
    documented inline; the oracle replays the identical chain.

    Normalization choices (all standard crawl-pipeline conventions):
    path/query CASE is preserved (paths are case-sensitive per RFC 3986;
    only scheme+authority fold), a lone trailing slash is equivalent to
    none, and a URL that was ONLY tracking params keeps no ``?``."""
    u0 = F.trim(url)
    # split at the scheme://authority boundary: authority rules run on
    # the lowercased prefix alone, rest rules on the reassembled URL —
    # no backref needed because the prefix regex is also how the suffix
    # offset is computed.
    raw_pfx = F.regexp_extract(u0, _P_PREFIX, 1)
    rest = F.substring(u0, F.length(raw_pfx) + 1, F.length(u0))
    pfx = F.lower(raw_pfx)
    pfx = F.regexp_replace(pfx, *_AUTH_RULES[0])  # userinfo first
    pfx = F.when(
        pfx.rlike(_WWW_GUARD), F.regexp_replace(pfx, *_WWW_RULE)
    ).otherwise(pfx)
    for pat, rep in _AUTH_RULES[1:]:
        pfx = F.regexp_replace(pfx, pat, rep)
    u = F.concat(pfx, rest)
    for pat, rep in _NORM_RULES:
        u = F.regexp_replace(u, pat, rep)
    return u


def normalize_url_oracle_sql(url_expr: str) -> str:
    """DuckDB expression replicating ``normalize_url`` on ``url_expr`` —
    generated from the SAME `_AUTH_RULES`/`_WWW_RULE`/`_NORM_RULES`
    constants the Spark chain applies (the moment_stats_oracle_sql
    discipline: one source of truth, two engines).  Duplicated
    sub-expressions (trim, the prefix extract, the www CASE operand)
    stand in for Spark's bound Column references."""
    u0 = f"trim({url_expr})"
    raw_pfx = f"regexp_extract({u0}, '{_P_PREFIX}', 1)"
    pfx = f"lower({raw_pfx})"
    p, r = _AUTH_RULES[0]
    pfx = f"regexp_replace({pfx}, '{p}', '{r}', 'g')"
    wp, wr = _WWW_RULE
    pfx = (
        f"(CASE WHEN regexp_matches({pfx}, '{_WWW_GUARD}') "
        f"THEN regexp_replace({pfx}, '{wp}', '{wr}', 'g') ELSE {pfx} END)"
    )
    for p, r in _AUTH_RULES[1:]:
        pfx = f"regexp_replace({pfx}, '{p}', '{r}', 'g')"
    u = f"({pfx} || substring({u0}, length({raw_pfx}) + 1, length({u0})))"
    for p, r in _NORM_RULES:
        u = f"regexp_replace({u}, '{p}', '{r}', 'g')"
    return u


# host extraction: skip optional userinfo, then strip port + trailing
# dot — shared with the oracle twin below
_P_HOST = r"://(?:[^/?#@]*@)?([^/?#]+)"


def url_host(url: Column) -> Column:
    """Authority host of a (normalized or raw) URL — userinfo skipped,
    port and trailing-dot FQDN stripped (raw URLs get the same hygiene
    normalize_url applies, so blocklist probes on raw URLs can't be
    bypassed by ``user@`` or ``host.`` spellings)."""
    host = F.regexp_extract(url, _P_HOST, 1)
    return F.regexp_replace(
        F.lower(F.regexp_replace(host, r":[0-9]+$", "")), r"\.$", ""
    )


def registered_domain(url: Column) -> Column:
    """Registrable domain of the URL's host: last THREE labels when the
    host ends in a known two-label public suffix (``example.co.uk``),
    else last TWO (``example.com``) — see ``_MULTIPART_TLDS`` for the
    documented PSL approximation.  Bare hosts (no dots) pass through."""
    host = url_host(url)
    three = F.regexp_extract(host, rf"([^.]+\.{_SUFFIX2_RE})", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(host.rlike(_MULTIPART_RE), three).otherwise(
        F.when(two != "", two).otherwise(host)
    )


def dedup_by_url(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level dedup over the NORMALIZED url: keep min(id) per URL →
    ``(url_norm, keep_id, n_copies)``.  One shuffle on the url key with
    map-side partial aggregation (exact_dedup_by_key's shape); the text
    column never rides the shuffle."""
    return (
        df.select(
            normalize_url(F.col(url_col)).alias("url_norm"), F.col(id_col)
        )
        .groupBy("url_norm")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def domain_blocklist_filter(
    df: DataFrame, url_col: str, blocked: DataFrame
) -> DataFrame:
    """Drop rows whose REGISTERED domain is blocklisted.  ``blocked`` is
    a one-column (``domain``) frame — blocklists are list-sized (UT1,
    adult/spam feeds: 10⁴–10⁶ rows), so it broadcasts; the corpus side is
    a map-only probe via broadcast LEFT ANTI join — no corpus shuffle.
    Matching is on the registered domain, so every subdomain of a blocked
    domain is caught (the standard blocklist semantic)."""
    b = blocked.select(F.lower(F.col("domain")).alias("_blocked_dom")).distinct()
    return df.join(
        F.broadcast(b),
        registered_domain(F.col(url_col)) == F.col("_blocked_dom"),
        "left_anti",
    )


def registered_domain_oracle_sql(url_expr: str) -> str:
    """DuckDB twin of ``registered_domain`` (same shared host/suffix
    constants)."""
    host = (
        f"regexp_replace(lower(regexp_replace("
        f"regexp_extract({url_expr}, '{_P_HOST}', 1),"
        f" ':[0-9]+$', '', 'g')), '\\.$', '', 'g')"
    )
    three = f"regexp_extract({host}, '([^.]+\\.{_SUFFIX2_RE})', 1)"
    two = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    return (
        f"CASE WHEN regexp_matches({host}, '{_MULTIPART_RE}') THEN {three} "
        f"WHEN {two} <> '' THEN {two} ELSE {host} END"
    )
