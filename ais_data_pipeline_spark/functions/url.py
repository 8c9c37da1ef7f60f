"""URL canonicalization — the web-corpus dedup key (r16).

Common Crawl-scale pipelines dedup fetches by CANONICAL URL before
any content pass: the same page arrives as ``HTTP://Example.COM:80/a``
, ``http://example.com/a?utm_source=x``, and ``http://example.com/a#f``
— superficial variants that canonicalize to one key. The rules here
are the widely-used conservative core (what the crawler community
calls "safe" normalizations — RFC 3986 §6.2.2/§6.2.3 plus tracking-
param stripping):

1. scheme and host lowercase;
2. default port dropped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), the REST kept and SORTED byte-wise (query
   order is almost never semantic; sorting merges permutations);
5. empty path -> ``/``.

Everything is column expressions (regexp + array HOFs — whole-stage
codegen, no Python), so canonicalization runs at scan speed and the
canonical key feeds the ordinary exact-dedup machinery. Deliberately
NOT done (the "unsafe" tier that changes semantics on real sites):
percent-decode, path dot-segment removal, www-stripping, param-value
case folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query params dropped by rule 4 — the ubiquitous click/campaign
#: trackers. Keyed by full param name or the utm_ prefix.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
# Anchored before any '#': a '?' that first appears inside the
# fragment is NOT a query (r16 ADVICE: the unanchored form leaked
# 'http://e.com/a#f?x=1' fragment content into the canonical key,
# violating rule 3 and splitting fetches of the same page).
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL column (NULL in
    -> NULL out; a string without a ``scheme://`` also -> NULL, the
    loud-by-absence choice: relative refs have no canonical identity
    without a base)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # default-port strip — anchored literal-port regexes, so IPv6
    # bracket colons are untouched and only :80/:443 suffixes drop
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(url.isNull() | (scheme == ""), F.lit(None)).otherwise(canon)


def url_dedup_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup accounting: one row per canonical key with
    its variant count and the kept (minimum-id) representative — the
    fetch-dedup head of a crawl pipeline. Shuffles only
    (canonical, id) pairs; canonicalization itself is scan-side
    codegen."""
    c = canonical_url(F.col(url_col)).alias("canonical_url")
    return (
        df.select(c, F.col(id_col))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min(id_col).alias("keep_id"),
        )
    )


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL, port stripped (NULL when
    there is no ``scheme://``). IPv6-safe: ``[2001:db8::1]:8080`` ->
    ``[2001:db8::1]`` (the ``:\\d+$`` strip only fires when digits
    terminate the string, which a bracket form never does)."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    return F.when(host == "", F.lit(None)).otherwise(host)


def url_block_flags(
    url: Column,
    blocked_hosts: tuple[str, ...],
    keywords: tuple[str, ...],
) -> dict[str, Column]:
    """RefinedWeb/UT1-style URL policy signals, all codegen:

    - ``host``: the extracted host (see ``url_host``);
    - ``host_blocked``: host equals a blocked domain OR is a
      subdomain of one (suffix match anchored at a label boundary —
      ``tracker.io.evil.com`` is NOT a match for ``tracker.io``, the
      classic suffix-matching bug);
    - ``kw_hits``: how many policy keywords appear in the lowercased
      URL — a SCORED column (the corpus decides the threshold), the
      same scored-not-dropped convention as link_density.

    For curated lists past a few thousand entries, join a broadcast
    host dim table instead of this literal expression — the operator
    is the expression form; the join form is ordinary engine machinery
    (``df.join(F.broadcast(hosts), ...)``)."""
    host = url_host(url)
    blocked = F.lit(False)
    for h in blocked_hosts:
        blocked = blocked | (host == h) | host.endswith("." + h)
    # NULL host (scheme-less / NULL url) is "not blocked", not NULL —
    # the flag feeds filters, and a NULL would silently drop the row
    # under a positive filter and keep it under a negated one
    blocked = F.coalesce(blocked, F.lit(False))
    low = F.lower(url)
    kw_hits = F.size(
        F.filter(
            F.array(*[F.lit(k) for k in keywords]),
            lambda k: low.contains(k),
        )
    )
    return {"host": host, "host_blocked": blocked, "kw_hits": kw_hits}
