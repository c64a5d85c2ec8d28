"""Domain-level corpus rollup — the crawl-curation staple.

Web-scale pipelines score and filter at the REGISTERED-DOMAIN level
(spam/SEO domains get blocklisted wholesale; quality priors are
per-domain): this operator extracts each URL's host, reduces it to
its registered domain (eTLD+1 with a public-suffix subset — the
multi-part suffixes a crawl actually hits; anything unknown falls
back to the last two labels, documented divergence from a full PSL),
and aggregates per-domain statistics.

Scale shape: host/domain extraction is a pure JVM projection
(regexp + array ops inside whole-stage codegen); the rollup is two
scalar aggregations — (domain, lang) counts, then per-domain argmax
+ stats — with map-side partial aggregation; document text/urls never
shuffle beyond the scalar aggregation keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# multi-part public suffixes handled by the subset (lowercase)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.ar",
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def registered_domain_col(url_col: str):
    """Registered domain (eTLD+1 subset) of a URL column, as a JVM
    expression column."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    suffix_hit = last2.isin(*MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(suffix_hit & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_stats(docs: DataFrame, url_col: str = "url",
                 lang_col: str = "lang",
                 chars_col: str = "n_chars") -> DataFrame:
    """Per-registered-domain rollup:
    ``(domain, n_docs, n_hosts, avg_chars, top_lang)``.

    ``top_lang`` is the majority language; ties resolve to the
    lexicographically LARGEST lang (max_by over struct(cnt, lang) —
    deterministic and mirrored by the oracle's window)."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    base = docs.select(
        registered_domain_col(url_col).alias("domain"),
        host.alias("host"),
        F.col(lang_col).alias("lang"),
        F.col(chars_col).alias("chars"),
    )
    per_lang = (
        base.groupBy("domain", "lang")
        .agg(F.count("*").alias("cnt"),
             F.sum("chars").alias("chars_sum"))
    )
    return (
        per_lang.groupBy("domain")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.expr("max_by(lang, struct(cnt, lang))").alias("top_lang"),
            F.round(F.sum("chars_sum") / F.sum("cnt"), 6)
            .alias("avg_chars"),
        )
        .join(
            base.groupBy("domain")
            .agg(F.countDistinct("host").cast("long").alias("n_hosts")),
            "domain",
        )
        .select("domain", "n_docs", "n_hosts", "avg_chars", "top_lang")
    )
