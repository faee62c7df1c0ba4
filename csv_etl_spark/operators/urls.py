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
# to one DFA pass in both engines.  Bare "ref" is deliberately NOT in
# the default — it is frequently a FUNCTIONAL parameter (?ref=<branch>,
# ?ref=<anchor-id>), and stripping it collapses genuinely distinct
# resources into one url_norm (silent document loss).  Callers whose
# corpus uses ref as a tracking key extend the set explicitly via the
# ``tracking_params`` argument of normalize_url / dedup_by_url.
TRACKING_PARAMS = "utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid"

# Multi-part public suffixes for the registered-domain approximation.
# This is NOT the full Public Suffix List (thousands of entries, updated
# monthly) — it is the documented approximation: two-label suffixes from
# the PSL's high-traffic head ANCHORED to a two-letter final label (all
# <sld>.<cc> pairs in this head are ccTLD second-levels; the anchor stops
# "sub.net.example"-style hosts — where the second-to-last label merely
# COLLIDES with the head list — from being treated as public suffixes),
# else "last two labels".  For the real thing, pass a PSL frame to
# ``registered_domain_psl`` / ``domain_blocklist_filter(..., psl=...)``
# below — a broadcast lookup table joined on the candidate suffixes.
_MULTIPART_TLDS = "co|com|org|net|ac|gov|edu|mil|sch"
# a host ending in a two-label public suffix, e.g. "…example.co.uk"
_SUFFIX2_RE = rf"(?:{_MULTIPART_TLDS})\.[a-z][a-z]$"
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
# these only ever touch path/query/fragment) — generated per tracking
# set so callers can extend/shrink it (see TRACKING_PARAMS note)


def _norm_rules(tracking_params: str) -> list[tuple[str, str]]:
    return [
        (r"#.*$", ""),  # fragment never reaches the server; drop first
        # tracking params, three backref-free cases: non-leading; leading
        # followed by a kept param (the '?' survives); leading and alone
        (rf"&(?:{tracking_params})=[^&#]*", ""),
        (rf"\?(?:{tracking_params})=[^&#]*&", "?"),
        (rf"\?(?:{tracking_params})=[^&#]*$", ""),
        # trailing slash at the path/query boundary ("/p/?q" ≡ "/p?q"); a
        # raw '?' later in a query is legal but should be percent-encoded
        # — this documented rule assumes it is
        (r"/\?", "?"),
        (r"\?$", ""),  # an emptied query marker
        (r"/$", ""),  # one trailing slash
    ]


_NORM_RULES: list[tuple[str, str]] = _norm_rules(TRACKING_PARAMS)


def normalize_url(url: Column, tracking_params: str = TRACKING_PARAMS) -> Column:
    """Canonical URL: lowercase scheme://host, strip ``www.``, default
    ports, fragments, tracking parameters, empty queries and one trailing
    slash.  NULL in → NULL out.  Each step is order-dependent and
    documented inline; the oracle replays the identical chain.

    ``tracking_params`` is the alternation of query keys stripped as
    tracking noise (default: utm_*/click-ids only — see the
    TRACKING_PARAMS note on why bare ``ref`` is opt-in).

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
    for pat, rep in _norm_rules(tracking_params):
        u = F.regexp_replace(u, pat, rep)
    return u


def normalize_url_oracle_sql(
    url_expr: str, tracking_params: str = TRACKING_PARAMS
) -> str:
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
    for p, r in _norm_rules(tracking_params):
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


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    tracking_params: str = TRACKING_PARAMS,
) -> DataFrame:
    """URL-level dedup over the NORMALIZED url: keep min(id) per URL →
    ``(url_norm, keep_id, n_copies)``.  One shuffle on the url key with
    map-side partial aggregation (exact_dedup_by_key's shape); the text
    column never rides the shuffle."""
    return (
        df.select(
            normalize_url(F.col(url_col), tracking_params).alias("url_norm"),
            F.col(id_col),
        )
        .groupBy("url_norm")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def domain_blocklist_filter(
    df: DataFrame, url_col: str, blocked: DataFrame, psl: DataFrame | None = None
) -> DataFrame:
    """Drop rows whose REGISTERED domain is blocklisted.  ``blocked`` is
    a one-column (``domain``) frame — blocklists are list-sized (UT1,
    adult/spam feeds: 10⁴–10⁶ rows), so it broadcasts; the corpus side is
    a map-only probe via broadcast LEFT ANTI join — no corpus shuffle.
    Matching is on the registered domain, so every subdomain of a blocked
    domain is caught (the standard blocklist semantic).

    Registered-domain resolution: the expression APPROXIMATION by default
    (see _MULTIPART_TLDS — a host under an unlisted multi-part public
    suffix, e.g. ``*.github.io`` or wildcard ccTLDs like ``*.ck``,
    resolves one label too short, so a blocklist entry for the true
    registrable domain can miss its subdomains there).  Pass ``psl`` (a
    ``psl_frame``) to resolve against the real Public Suffix List via
    broadcast longest-suffix joins — still zero corpus shuffles."""
    b = blocked.select(F.lower(F.col("domain")).alias("_blocked_dom")).distinct()
    if psl is None:
        return df.join(
            F.broadcast(b),
            registered_domain(F.col(url_col)) == F.col("_blocked_dom"),
            "left_anti",
        )
    tagged = registered_domain_psl(df, url_col, psl, out_col="_reg_dom")
    return tagged.join(
        F.broadcast(b), F.col("_reg_dom") == F.col("_blocked_dom"), "left_anti"
    ).drop("_reg_dom")


# ---------------------------------------------------------------------------
# PSL-backed registered domain (broadcast lookup table, longest match)
# ---------------------------------------------------------------------------

# A head subset of the Public Suffix List (publicsuffix.org, public
# domain data) in its native rule syntax: plain suffix, "*." wildcard
# (one MORE label is part of the public suffix), "!" exception (the rule
# itself is registrable, overriding a wildcard).  This ships as the
# default table for tests/dev; production passes the full list (~9k
# rules) to psl_frame — the operator's joins are rule-count-agnostic.
PSL_HEAD_RULES: list[str] = [
    # ccTLD second-level registries (high-traffic head)
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "gen.tr", "web.tr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "go.id", "sch.id",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "name.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "web.ve",
    "waw.pl", "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    # private-section hosting suffixes (each customer site is its own
    # registrable domain — the blocklist-granularity cases)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "pages.dev", "workers.dev",
    "appspot.com", "fly.dev", "onrender.com", "readthedocs.io",
    # wildcard ccTLDs (every second-level is a registry): host x.y.ck
    # has public suffix y.ck, registrable x.y.ck
    "*.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    # exception: www.ck itself is registrable despite *.ck
    "!www.ck",
]

# Deepest rule depth the candidate-suffix joins probe.  The real PSL's
# deepest rules are 4 labels; +1 headroom is free (a NULL candidate
# never matches).
_PSL_MAX_LABELS = 5


def psl_frame(spark, rules: list[str] | None = None) -> DataFrame:
    """Parse PSL rule strings into the lookup table the join operators
    consume: ``(suffix, kind, nlab)`` where ``kind`` ∈ normal | wildcard
    | exception, ``suffix`` is the rule with markers stripped and
    ``nlab`` its label count.  List-sized (≤ ~9k rows for the full PSL)
    — always broadcast."""
    rows = []
    for r in rules if rules is not None else PSL_HEAD_RULES:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            kind, sfx = "exception", r[1:]
        elif r.startswith("*."):
            kind, sfx = "wildcard", r[2:]
        else:
            kind, sfx = "normal", r
        rows.append((sfx, kind, sfx.count(".") + 1))
    # inline-VALUES LocalRelation, not createDataFrame: the rule table is
    # consumed by max_labels broadcast builds — a Python-RDD spelling runs
    # a cluster-wide Python stage per build (see csv_etl_spark.local)
    from csv_etl_spark.local import local_values_frame

    return local_values_frame(
        spark, rows, "suffix string, kind string, nlab int"
    )


def registered_domain_psl(
    df: DataFrame,
    url_col: str,
    psl: DataFrame,
    out_col: str = "registered_domain",
    max_labels: int = _PSL_MAX_LABELS,
) -> DataFrame:
    """Append ``out_col`` = the PSL-resolved registrable domain of
    ``url_col``'s host (publicsuffix.org algorithm: longest matching
    rule wins; wildcard adds one label; exception overrides wildcard;
    no match ⇒ the final label is the public suffix).  A host that IS
    a public suffix has no registrable domain → NULL.

    Scale shape — ZERO corpus shuffles: one broadcast LEFT join per
    candidate depth k = 1..max_labels (the candidate is the host's last
    k labels, a map-side expression), each against the per-depth slice
    of the broadcast PSL table; the winning depth is a greatest()/
    coalesce() over the ≤ max_labels joined columns.  A per-host
    explode + groupBy(argmax) spelling would shuffle the corpus on the
    row id — this multi-join form keeps the whole operator inside one
    map stage, which is the difference between "free column" and "extra
    100 TB shuffle" at target scale.

    Rule semantics per depth k: a normal rule of k labels ⇒ public
    suffix length k; a wildcard rule ``*.X`` with X of k labels matches
    hosts whose last k labels equal X ⇒ public suffix length k+1; an
    exception ``!Y`` with Y of k labels ⇒ public suffix length k-1
    (Y itself is registrable).  Exceptions take precedence, then the
    longest implied length, then the no-match default of 1."""
    per_k = (
        psl.select(
            "suffix",
            F.when(F.col("kind") == "normal", F.col("nlab"))
            .when(F.col("kind") == "wildcard", F.col("nlab") + 1)
            .alias("imp"),
            F.when(F.col("kind") == "exception", F.col("nlab") - 1).alias("exc"),
        )
        .groupBy("suffix")
        .agg(F.max("imp").alias("imp"), F.max("exc").alias("exc"))
        .withColumn("nlab", F.size(F.split("suffix", r"\.")))
    )

    host = url_host(F.col(url_col))
    labels = F.split(host, r"\.")
    out = df.withColumn("_labels", labels)
    imp_cols: list[Column] = []
    exc_cols: list[Column] = []
    for k in range(1, max_labels + 1):
        cand = F.when(
            F.size("_labels") >= k, F.array_join(F.slice("_labels", -k, k), ".")
        )
        rules_k = per_k.filter(F.col("nlab") == k).select(
            F.col("suffix").alias(f"_sfx{k}"),
            F.col("imp").alias(f"_imp{k}"),
            F.col("exc").alias(f"_exc{k}"),
        )
        out = out.join(
            F.broadcast(rules_k), cand == F.col(f"_sfx{k}"), "left"
        ).drop(f"_sfx{k}")
        imp_cols.append(F.col(f"_imp{k}"))
        exc_cols.append(F.col(f"_exc{k}"))
    # exception wins outright (deepest first); else longest implied
    # suffix; else the default rule "*" (final label is public)
    ps_len = F.coalesce(
        *reversed(exc_cols), F.greatest(*imp_cols, F.lit(1))
    )
    # F.slice takes Column start/length; negative start counts from the
    # end, so this is "the last ps_len+1 labels"
    reg = F.when(
        F.size("_labels") > ps_len,
        F.array_join(F.slice("_labels", -(ps_len + 1), ps_len + 1), "."),
    )
    drop_cols = [f"_imp{k}" for k in range(1, max_labels + 1)] + [
        f"_exc{k}" for k in range(1, max_labels + 1)
    ]
    return out.withColumn(out_col, reg).drop("_labels", *drop_cols)


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
