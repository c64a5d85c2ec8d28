"""Domain-level corpus rollup — the crawl-curation staple.

Web-scale pipelines score and filter at the REGISTERED-DOMAIN level
(spam/SEO domains get blocklisted wholesale; quality priors are
per-domain): this operator extracts each URL's host, reduces it to
its registered domain (eTLD+1 against the inlined PSL ICANN-section
snapshot in operators/psl_snapshot.py — 2-label and 3-label suffix
rules, wildcard TLDs, exception rules; anything unknown falls back
to the last two labels, the standard PSL-consumer fallback), and
aggregates per-domain statistics.  URLs with no extractable host
(scheme-less strings, relative links) are DROPPED before
aggregation — otherwise they all collapse into one bogus
empty-string domain that silently skews the rollup.

Scale shape: host/domain extraction is a pure JVM projection
(regexp + array ops inside whole-stage codegen); the rollup is two
scalar aggregations — (domain, lang) counts, then per-domain argmax
+ stats — with map-side partial aggregation; document text/urls never
shuffle beyond the scalar aggregation keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_to_text_extraction_service_spark.operators.psl_snapshot import (
    PSL_EXCEPTIONS,
    PSL_THREE_LABEL,
    PSL_TWO_LABEL,
    PSL_WILDCARD_TLDS,
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def registered_domain_col(url_col: str):
    """Registered domain (eTLD+1 per the PSL snapshot) of a URL
    column, as a JVM expression column.  The suffix tables compile to
    ``InSet`` membership tests inside whole-stage codegen (hash-set
    lookups, no broadcast join, no Python).  Rule precedence follows
    the PSL algorithm: exception > longest matching rule > wildcard >
    last-two-labels fallback."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    last2 = F.concat_ws(".", F.slice(parts, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    last4 = F.concat_ws(".", F.slice(parts, n - 3, 4))
    null = F.lit(None).cast("string")
    # A host that IS a public suffix has no registrable domain — PSL
    # consumers return nothing for it, so emit NULL (r6; previously
    # such hosts aggregated as their own domain).  Single-label hosts
    # fall under the PSL's implicit '*' rule, so they are suffixes
    # too.  Exception rules are checked first: an exception label IS
    # registrable (e.g. www.ck under *.ck).
    return (
        F.when(n <= 1, null)
        .when(last2.isin(*PSL_EXCEPTIONS), last2)
        .when((n == 2) & (last2.isin(*PSL_TWO_LABEL)
                          | last1.isin(*PSL_WILDCARD_TLDS)), null)
        .when((n == 3) & last3.isin(*PSL_THREE_LABEL), null)
        .when((n >= 4) & last3.isin(*PSL_THREE_LABEL), last4)
        .when((n >= 3) & last2.isin(*PSL_TWO_LABEL), last3)
        .when((n >= 3) & last1.isin(*PSL_WILDCARD_TLDS), last3)
        .otherwise(F.when(n <= 2, host).otherwise(last2))
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
    ).filter(F.col("host") != "")  # drop hostless URLs (see module doc)
    # suffix-only hosts (domain NULL) have no registrable domain —
    # drop them like hostless rows rather than aggregating NULL
    base = base.filter(F.col("domain").isNotNull())
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


def filter_blocked_domains(docs: DataFrame, blocklist: DataFrame,
                           url_col: str = "url",
                           domain_col: str = "domain") -> DataFrame:
    """Drop documents whose REGISTERED domain (PSL reduction above)
    appears in a blocklist table — the spam/SEO wholesale filter every
    crawl pipeline runs after the per-domain rollup.

    Scale shape: the blocklist (thousands-to-millions of rows, tiny
    next to the corpus) is deduped then BROADCAST; the corpus side is
    a map-side left-anti hash join — document rows never shuffle.
    Suffix-only hosts (NULL registered domain) never match a
    blocklist entry, so they pass the gate — blocklisting a bare
    public suffix is out of scope by PSL semantics."""
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_bldom"))
        .dropDuplicates(["_bldom"]))
    return (
        docs.withColumn("_dom", registered_domain_col(url_col))
        .join(bl, F.col("_dom") == F.col("_bldom"), "left_anti")
        .drop("_dom")
    )
