"""Robots-meta gate — the crawl-compliance curation staple.

Real curation pipelines drop pages whose authors opted out of
indexing: ``<meta name="robots" content="noindex">`` (and the
crawler-specific variants) or the ``X-Robots-Tag`` response header.
This operator extracts those flags from the raw HTML bytes with pure
JVM expressions — ``regexp_extract`` over the head, no Python, no
shuffle — so the gate is a free map-side filter at any scale.

Semantics (Google/Bing documented behavior, public):
- the meta tag may appear anywhere in ``<head>``; name matching is
  case-insensitive and matches exactly ``robots`` (crawler-specific
  names like ``googlebot`` are a documented out-of-subset gap —
  matching them would need a bot-name list);
- content is a comma-separated directive list; ``noindex`` and
  ``none`` (= noindex,nofollow) both exclude the page from corpora;
- ``nofollow`` alone keeps the page but marks its links untrusted.

The regex subset requires the conventional attribute order
(``name`` before ``content``), which covers generator output and the
overwhelming majority of real pages; a tree-builder pass would catch
reversed-attribute stragglers at Python cost (documented trade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?<![-\w:]) pins the ATTRIBUTE name (no data-name/stroke-width
# style false matches); the value must be exactly `robots` — quoted,
# or unquoted terminated by space or '>'.
_META_RE = (
    r'(?is)<meta\s[^>]*?(?<![-\w:])name\s*=\s*'
    r'(?:"\s*robots\s*"|\'\s*robots\s*\'|robots(?=[\s/>]))[^>]*'
    r'(?<![-\w:])content\s*=\s*["\']([^"\'>]*)'
)


def robots_directives(html_col: str = "html") -> Column:
    """Lower-cased directive list of the first robots meta tag, or
    empty string when absent; accepts string or binary input."""
    text = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    return F.lower(F.regexp_extract(text, _META_RE, 1))


def robots_flags(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``noindex`` / ``nofollow`` boolean columns (as ints, so
    cross-engine hashing stays simple) derived from the robots meta
    directives."""
    d = robots_directives(html_col)
    toks = F.split(F.regexp_replace(d, r"\s+", ""), ",")
    has = (lambda t: F.array_contains(toks, t).cast("int"))
    return docs.withColumn(
        "noindex",
        F.greatest(has("noindex"), has("none")),
    ).withColumn(
        "nofollow",
        F.greatest(has("nofollow"), has("none")),
    )


def drop_noindex(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """The curation gate: keep only pages whose authors did not opt
    out of indexing.  Pure map-side filter — the predicate pushes
    into the scan's filter stage, zero shuffle."""
    return robots_flags(docs, html_col).filter(
        F.col("noindex") == 0).drop("noindex", "nofollow")
