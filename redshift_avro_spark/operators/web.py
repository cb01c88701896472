"""URL canonicalization + host-level dedup — the standard FIRST pass
of every web-crawl curation pipeline (CCNet, RefinedWeb, C4: dedup by
canonical URL before any content hashing touches the corpus, then
profile per host). The reference delegates all relational processing
downstream (README.md:13-17); this is the web-corpus member of that
downstream surface.

Canonicalization rules (deterministic string surgery, replayable in
ANSI SQL so the DuckDB oracle pins every value):

1. the fragment (``#…``) is dropped;
2. scheme and host lowercase;
3. a default port is dropped (``:80`` for http, ``:443`` for https —
   any OTHER scheme/port pair is kept verbatim, including ``:80`` on
   https);
4. trailing slashes on a non-root path are dropped (``/a/`` → ``/a``,
   ``/`` stays ``/``); a URL with no path gets ``/``;
5. tracking parameters are dropped — a query key is tracking when it
   starts with ``utm_`` or is one of ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``, ``referrer`` — and the survivors are sorted
   byte-wise and re-joined (param ORDER never distinguishes two URLs).

Scope: ``scheme://host[:port][/path][?query]`` shapes (a query string
on an authority with no path is out of scope — crawler URL lists
always carry at least ``/``). Userinfo (``user@host``) is not parsed.

Scale shape (100 TB): canonicalization is a narrow per-row projection
of JVM string/array expressions — no Python, no shuffle, runs at scan
speed inside whole-stage codegen (the split/filter/sort lambdas are
interpreted HOFs over ≤ a handful of query params, not corpus-scale
arrays). The dedup is ONE shuffle on the md5 of the canonical URL (a
uniform 8-byte-prefix key — identical skew profile to exact content
dedup), and the host rollup is a second map-side-combining aggregation
on the (already lowercase) host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["TRACKING_KEYS", "canonicalize_urls", "url_dedup"]

# exact-match tracking keys, alongside the utm_ prefix family
TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "ref", "referrer")


def _canonical_sql(url: str) -> str:
    """The canonicalization as one Spark SQL expression over ``url``
    (rules in the module docstring)."""
    keys = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    u = f"split_part({url}, '#', 1)"
    scheme = f"lower(split_part({u}, '://', 1))"
    rest = f"split_part({u}, '://', 2)"
    hostport = f"split_part(split_part({rest}, '/', 1), '?', 1)"
    host = f"lower(split_part({hostport}, ':', 1))"
    port = f"nullif(split_part({hostport}, ':', 2), '')"
    portpart = (
        f"CASE WHEN {port} IS NULL"
        f" OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE concat(':', {port}) END"
    )
    pathq = (
        f"CASE WHEN instr({rest}, '/') > 0"
        f" THEN substring({rest}, instr({rest}, '/')) ELSE '/' END"
    )
    rawpath = f"regexp_replace(split_part({pathq}, '?', 1), '/+$', '')"
    path = f"CASE WHEN {rawpath} = '' THEN '/' ELSE {rawpath} END"
    qs = f"split_part({pathq}, '?', 2)"
    params = (
        f"array_join(array_sort(filter(split({qs}, '&'), p -> p != ''"
        f" AND NOT startswith(split_part(p, '=', 1), 'utm_')"
        f" AND NOT split_part(p, '=', 1) IN ({keys}))), '&')"
    )
    qpart = f"CASE WHEN {params} = '' THEN '' ELSE concat('?', {params}) END"
    return f"concat({scheme}, '://', {host}, {portpart}, {path}, {qpart})"


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    host_col: str = "host",
) -> DataFrame:
    """Append ``out_col`` and the lowercase ``host_col`` to ``df`` — a
    narrow JVM projection, no shuffle. Raises if either output column
    already exists on the input (silently overwriting a caller's
    ``host`` column would corrupt downstream joins)."""
    for c in (out_col, host_col):
        if c in df.columns:
            raise ValueError(
                f"canonicalize_urls: output column {c!r} already exists on the "
                "input frame; pass a different out_col/host_col"
            )
    u = f"split_part({url_col}, '#', 1)"
    rest = f"split_part({u}, '://', 2)"
    hostport = f"split_part(split_part({rest}, '/', 1), '?', 1)"
    return df.withColumn(out_col, F.expr(_canonical_sql(url_col))).withColumn(
        host_col, F.expr(f"lower(split_part({hostport}, ':', 1))")
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    """Exact dedup on the canonical URL + per-host rollup.

    Returns one row per input row: ``(id, host, canonical_url,
    url_keeper_id, n_url_dups, is_url_keeper, host_docs,
    host_unique_urls)`` — the keeper is the min id per canonical URL
    (the deterministic election every exact-dedup path here uses), and
    the host columns profile the crawl per site (a host whose
    docs/unique ratio is high is a boilerplate farm).

    One shuffle keyed on the canonical URL for the dedup aggregation,
    one map-side-combining aggregation on host for the rollup (the
    rollup frame is hosts-sized — broadcast back)."""
    from .staging import materialize

    # three consumers (dedup groups, host rollup, final join) — cut
    # the lineage so the corpus scans ONCE and the consumers re-read
    # the narrow (id, host, canonical) frame instead of re-projecting
    # the full documents table per consumer; corpus-ROW-scale →
    # parquet per the staging rule
    c = materialize(
        canonicalize_urls(df, url_col).select(
            F.col(id_col).alias("__id"), "host", "canonical_url"
        ),
        label="url_canonical",
        default="parquet",
    )
    groups = c.groupBy("canonical_url").agg(
        F.min("__id").alias("url_keeper_id"),
        F.count("*").cast("long").alias("n_url_dups"),
    )
    hosts = c.groupBy("host").agg(
        F.count("*").cast("long").alias("host_docs"),
        F.countDistinct("canonical_url").cast("long").alias("host_unique_urls"),
    )
    return (
        c.join(groups, "canonical_url")
        .join(F.broadcast(hosts), "host")
        .select(
            F.col("__id").alias(id_col),
            "host",
            "canonical_url",
            "url_keeper_id",
            "n_url_dups",
            (F.col("__id") == F.col("url_keeper_id")).alias("is_url_keeper"),
            "host_docs",
            "host_unique_urls",
        )
    )
