"""Web-corpus URL operators: canonicalization + canonical-URL dedup.

Common-Crawl-style pipelines dedup pages by CANONICAL url before any
content-based dedup: the same page is fetched as http/HTTP/:443 variants,
with tracking query params (utm_*, gclid, ...), fragments, and shuffled
param order. Canonicalization here follows the conservative common core
of url normalizers (RFC 3986 §6 syntax-based normalization + tracking-
param strip):

  1. drop the fragment (``#...`` — never sent to the server);
  2. lowercase the scheme and authority (host) — path case is preserved
     (it is semantic on most servers);
  3. drop the default port (``:80`` for http, ``:443`` for https);
  4. drop known tracking params (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``igshid``, ``ref``) and sort the remaining query
     params (param order is almost never semantic; sorting makes the
     canonical form order-insensitive);
  5. drop a now-empty ``?``.

Everything is pure codegen (regexp + array higher-order functions): zero
shuffle for the projection, one hash aggregation for the dedup — at
10^12 pages the groupBy key is the canonical url, naturally
host-clustered, so AQE-coalesced hash partitioning absorbs it. The exact
same rules are emitted as a DuckDB expression for the bit-parity oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://authority prefix (before any /path, ?query or #fragment)
_HEAD_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# one query param that is pure tracking noise
_TRACK_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|igshid|ref)(=|$)"


def url_canonicalize(col: Column | str) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    u0 = F.regexp_replace(u, "#.*$", "")  # 1. fragment
    head = F.lower(F.regexp_extract(u0, _HEAD_RE, 0))  # 2. scheme+host
    head = F.regexp_replace(head, "^(http://[^:/]*):80$", "$1")  # 3. ports
    head = F.regexp_replace(head, "^(https://[^:/]*):443$", "$1")
    rest = F.regexp_replace(u0, _HEAD_RE, "")  # path + query
    path = F.regexp_replace(rest, "\\?.*$", "")
    q = F.regexp_extract(u0, "\\?(.*)$", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACK_RE),  # 4. tracking params
    )
    qs = F.array_join(F.array_sort(kept), "&")  # 4. sorted params
    return F.concat(
        head,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_canonicalize_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_canonicalize` (RE2 backrefs are ``\\1``;
    DuckDB regexp_replace replaces the first match, which equals Spark's
    replace-all on these anchored/single-match patterns)."""
    u0 = f"regexp_replace({expr}, '#.*$', '')"
    head = f"lower(regexp_extract({u0}, '{_HEAD_RE}'))"
    head = f"regexp_replace({head}, '^(http://[^:/]*):80$', '\\1')"
    head = f"regexp_replace({head}, '^(https://[^:/]*):443$', '\\1')"
    rest = f"regexp_replace({u0}, '{_HEAD_RE}', '')"
    path = f"regexp_replace({rest}, '\\?.*$', '')"
    q = f"regexp_extract({u0}, '\\?(.*)$', 1)"
    kept = (
        f"list_filter(string_split({q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACK_RE}'))"
    )
    # DuckDB's array_to_string([], sep) is NULL (Spark's array_join is '')
    qs = f"coalesce(array_to_string(list_sort({kept}), '&'), '')"
    return (
        f"{head} || {path} || "
        f"(CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)"
    )


def canonical_url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical url: the earliest-fetched variant wins.

    Returns ``(canonical_url, n_dup, first_ts, kept_url)`` — the dedup
    manifest a crawl pipeline joins back against to drop late refetches.
    Single hash aggregation; ties on ``ts_col`` broken by the raw url so
    the kept row is deterministic under any partitioning.
    """
    canon = url_canonicalize(url_col).alias("canonical_url")
    pick = F.struct(F.col(ts_col), F.col(url_col)).alias("_pick")
    return (
        pages.select(canon, F.col(ts_col), F.col(url_col), pick)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dup"),
            F.min(ts_col).alias("first_ts"),
            F.min("_pick").getField(url_col).alias("kept_url"),
        )
    )


# ---------------------------------------------------------------------------
# host-suffix blocklist (domain-ban filtering)
# ---------------------------------------------------------------------------

# host part of a url: text between "scheme://" and the first /:?# —
# ports and userinfo excluded by the character class
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#@]+)"


def url_host(col: Column | str) -> Column:
    """Lowercased host of a url (empty string when the url has none)."""
    u = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def url_host_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: ``a.b.c -> [a.b.c, b.c, c]``.

    The domain-match law every crawler blocklist uses: a ban on ``b.c``
    must catch ``a.b.c`` but NOT ``ab.c`` — string `endswith` gets that
    wrong; suffix-on-label-boundaries is exact."""
    parts = F.split(host, "\\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def host_blocklist_filter(
    pages: DataFrame,
    blocked: list[str],
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or keep, for auditing) rows whose url host matches the
    blocklist on a domain boundary — the robots/domain-ban step a
    Common-Crawl-style pipeline runs before any content work.

    For literal blocklists (up to a few thousand domains) the match is
    ``arrays_overlap(host_suffixes, lit(blocked))`` — pure codegen riding
    the scan, ZERO shuffle. For million-domain lists, switch to the join
    law with identical semantics: explode ``host_suffixes`` and
    broadcast-LEFT-SEMI/ANTI join the blocklist table on the suffix —
    still no wide shuffle (the big side never moves; documented here,
    same `host_suffixes` column feeds both).
    """
    bl = F.array(*[F.lit(d.lower()) for d in sorted(set(blocked))])
    hit = F.arrays_overlap(host_suffixes(url_host(url_col)), bl)
    return pages.where(hit if keep_blocked else ~hit)


def host_blocklist_sql(
    url_expr: str, blocked: list[str], keep_blocked: bool = False
) -> str:
    """DuckDB twin predicate — same suffix law via list_has_any."""
    host = url_host_sql(url_expr)
    items = ", ".join(f"'{d.lower()}'" for d in sorted(set(blocked)))
    sufs = (
        f"list_transform(range(0, len(string_split({host}, '.'))), "
        f"i -> array_to_string(list_slice(string_split({host}, '.'), "
        f"i + 1, len(string_split({host}, '.'))), '.'))"
    )
    pred = f"list_has_any({sufs}, [{items}])"
    return pred if keep_blocked else f"NOT ({pred})"
