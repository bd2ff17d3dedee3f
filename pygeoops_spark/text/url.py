"""URL / host analytics for web-page tables (pure SQL).

The input_hint schema carries a ``url`` per page; a training-data
pipeline needs host-level views of the corpus: canonical host
extraction (scheme/userinfo/port stripped, lowercased), path depth,
normalization, and per-host rollups (page counts, exact-dup rate) that
drive host-level filtering and balanced sampling.  Everything here is
built-in string functions — whole-stage codegen, no UDF — so at
10^12 rows these ride the scan like the tile-assignment projections.

The reference library has no URL layer (it is a geometry package);
this module is part of the engine's brand-new web-scale surface, like
text/quality.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _after_scheme(url: Column) -> Column:
    """Text after the FIRST '//' (the scheme separator); the input
    unchanged when there is no '//'.  Anchoring on the first occurrence
    matters for real crawl URLs with '//' later in the path or query
    (protocol-relative / absolute URLs embedded in redirect params,
    e.g. 'https://a.com/r?u=https://b.com')."""
    pos = F.instr(url, "//")
    return F.when(
        pos > 0, F.substring(url, pos + F.lit(2), F.lit(1 << 20))
    ).otherwise(url)


def _no_query_fragment(after_scheme: Column) -> Column:
    return F.substring_index(F.substring_index(after_scheme, "#", 1), "?", 1)


def url_host(url: Column | str) -> Column:
    """Canonical host: the authority part lowercased, with userinfo
    (``user@``, WHATWG last-'@' rule) and port (``:443``) stripped.
    Authority is taken from the query/fragment-stripped string so bare
    hosts like 'https://h?q=1' resolve to 'h'.  Pure substring_index
    chains — no regex."""
    url = _as_col(url)
    no_fq = _no_query_fragment(_after_scheme(url))
    authority = F.substring_index(no_fq, "/", 1)
    no_user = F.substring_index(authority, "@", -1)
    no_port = F.substring_index(no_user, ":", 1)
    return F.lower(no_port)


def url_path(url: Column | str) -> Column:
    """Path component ('' for bare hosts): everything from the first
    '/' after the authority, query/fragment stripped."""
    url = _as_col(url)
    no_fq = _no_query_fragment(_after_scheme(url))
    authority = F.substring_index(no_fq, "/", 1)
    return F.substring(no_fq, F.length(authority) + 1, F.lit(1 << 20))


def url_path_depth(url: Column | str) -> Column:
    """Number of non-empty path segments (``/a/b/1`` -> 3)."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: s != "")
    return F.size(segs).cast("long")


def url_normalize(url: Column | str) -> Column:
    """Canonical form: lowercased scheme and host, userinfo stripped,
    DEFAULT port stripped (':80' for http, ':443' for https — explicit
    non-default ports like ':8080' are kept, they change URL identity),
    fragment dropped, query kept, trailing slash on a bare path
    dropped.  Input without '//' is returned unchanged (nothing to
    normalize without a scheme separator)."""
    url = _as_col(url)
    pos = F.instr(url, "//")
    scheme = F.lower(F.substring_index(url, "//", 1))  # e.g. 'https:'
    rest = F.substring(url, pos + F.lit(2), F.lit(1 << 20))
    no_frag = F.substring_index(rest, "#", 1)
    authority = F.substring_index(F.substring_index(no_frag, "?", 1), "/", 1)
    tail = F.substring(no_frag, F.length(authority) + 1, F.lit(1 << 20))
    no_user = F.substring_index(authority, "@", -1)
    host = F.lower(F.substring_index(no_user, ":", 1))
    cpos = F.instr(no_user, ":")
    port = F.when(
        cpos > 0, F.substring(no_user, cpos + F.lit(1), F.lit(16))
    ).otherwise(F.lit(""))
    default_port = (
        (port == "")
        | ((scheme == "http:") & (port == "80"))
        | ((scheme == "https:") & (port == "443"))
    )
    hostport = F.when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    tail = F.when(tail == "/", F.lit("")).otherwise(tail)
    return F.when(
        pos > 0, F.concat(scheme, F.lit("//"), hostport, tail)
    ).otherwise(url)


def host_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host corpus rollup: page count, distinct-text count, exact
    dup rate (1 - distinct/pages), max path depth.  One aggregation;
    the distinct-text count uses xxhash64 so the shuffle carries 8-byte
    keys, never document bodies."""
    return (
        df.select(
            url_host(url_col).alias("host"),
            url_path_depth(url_col).alias("_depth"),
            F.xxhash64(text_col).alias("_th"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("_th").alias("n_distinct_text"),
            F.max("_depth").alias("max_path_depth"),
        )
        .withColumn(
            "dup_rate",
            F.round(
                F.lit(1.0) - F.col("n_distinct_text") / F.col("n_pages"), 6
            ),
        )
    )


def host_balanced_sample(
    df: DataFrame, per_host: int, url_col: str = "url"
) -> DataFrame:
    """At most ``per_host`` pages per host, chosen by deterministic
    hash order (rerun-stable) — the standard guard against a single
    crawler-friendly host dominating a training mix."""
    from pyspark.sql import Window

    h = url_host(url_col)
    w = Window.partitionBy("_host").orderBy(
        F.xxhash64(url_col).asc(), F.col(url_col).asc()
    )
    return (
        df.withColumn("_host", h)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= per_host)
        .drop("_host", "_rk")
    )
