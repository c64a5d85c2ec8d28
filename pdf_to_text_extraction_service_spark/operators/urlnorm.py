"""URL canonicalization — the normalizer in front of url-keyed dedup.

Common Crawl captures the same page under trivially-different urls
(case-variant scheme/host, default ports, fragment anchors, tracking
params, unsorted query strings). Canonicalizing before ``dedup_latest``
merges those captures. Pure JVM expressions (regexp_extract +
array_sort), mirrorable 1:1 in the DuckDB oracle.

Rules (documented subset — enough for crawl dedup, not a full
WHATWG-URL implementation):
- scheme and host lowercased
- default ports stripped (http:80, https:443)
- fragment dropped
- query params: empty and ``utm_*`` tracking params dropped, the rest
  byte-sorted; '?' dropped when nothing survives
- empty path becomes '/'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url_col: str = "url") -> Column:
    c = url_col
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = f"regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    norm_path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({c}, '\\\\?([^#]*)', 1)"
    params = (
        f"array_sort(filter(split({query}, '&'), "
        f"p -> p != '' AND p NOT LIKE 'utm_%'))"
    )
    qpart = (
        f"CASE WHEN size({params}) > 0 "
        f"THEN concat('?', array_join({params}, '&')) ELSE '' END"
    )
    return F.expr(
        f"CASE WHEN {scheme} = '' THEN {c} "
        f"ELSE concat({scheme}, '://', {host}, {norm_path}, {qpart}) END"
    )


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url(url_col))


# DuckDB mirror of the same rules (same regexes, list functions).
def canonical_url_sql(c: str) -> str:
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (f"lower(regexp_extract({c}, "
                f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))")
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = (f"regexp_extract({c}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)")
    norm_path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({c}, '\\?([^#]*)', 1)"
    params = (f"list_sort(list_filter(string_split({query}, '&'), "
              f"p -> p != '' AND p NOT LIKE 'utm_%'))")
    qpart = (f"CASE WHEN len({params}) > 0 "
             f"THEN '?' || array_to_string({params}, '&') ELSE '' END")
    return (f"CASE WHEN {scheme} = '' THEN {c} "
            f"ELSE {scheme} || '://' || {host} || {norm_path} || {qpart} END")
