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
- BOTH attribute orders are accepted (``name`` before ``content``
  and reversed), and the content value may be double-quoted,
  single-quoted, or unquoted (r6; previously name-first quoted
  only);
- content is a comma-separated directive list; ``noindex`` and
  ``none`` (= noindex,nofollow) both exclude the page from corpora;
- ``nofollow`` alone keeps the page but marks its links untrusted;
- an ``X-Robots-Tag`` response-header value can be supplied as an
  extra column; its directive list is parsed the same way.  Agent-
  prefixed forms (``googlebot: noindex``) and parameterized
  directives (``unavailable_after: <date>``) are not decomposed —
  the un-prefixed noindex/none/nofollow tokens are the gate subset.

Residual gap (documented): when a page carries BOTH a quoted-empty
``content=""`` robots tag and a second robots tag, the first tag's
empty value falls through to the later one (the coalesce picks the
first non-empty match per pattern family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?<![-\w:]) pins the ATTRIBUTE name (no data-name/stroke-width
# style false matches); the value must be exactly `robots` — quoted,
# or unquoted terminated by space or '>'.
_NAME_ROBOTS = (
    r'(?<![-\w:])name\s*=\s*'
    r'(?:"\s*robots\s*"|\'\s*robots\s*\'|robots(?=[\s/>]))'
)
# content value: quoted (anything but quotes/>) or unquoted (one
# token, stops at whitespace / '/' / '>' — robots directives never
# contain '/', so excluding it also handles `content=noindex/>`)
_CONTENT_Q = r'(?<![-\w:])content\s*=\s*["\']([^"\'>]*)'
_CONTENT_U = r'(?<![-\w:])content\s*=\s*([^"\'>\s/]+)'

# four pattern families: attribute order x quoting style
_META_RES = [
    rf"(?is)<meta\s[^>]*?{_NAME_ROBOTS}[^>]*{_CONTENT_Q}",
    rf"(?is)<meta\s[^>]*?{_NAME_ROBOTS}[^>]*{_CONTENT_U}",
    rf"(?is)<meta\s[^>]*?{_CONTENT_Q}[^>]*{_NAME_ROBOTS}",
    rf"(?is)<meta\s[^>]*?{_CONTENT_U}[^>]*{_NAME_ROBOTS}",
]


def robots_directives(html_col: str = "html") -> Column:
    """Lower-cased directive list of the first matching robots meta
    tag (either attribute order, any quoting), or empty string when
    absent; accepts string or binary input."""
    text = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    first = F.lit("")
    for pat in reversed(_META_RES):
        ext = F.regexp_extract(text, pat, 1)
        first = F.when(ext != "", ext).otherwise(first)
    return F.lower(first)


def _directive_flags(directives: Column) -> tuple[Column, Column]:
    toks = F.split(F.regexp_replace(directives, r"\s+", ""), ",")
    has = (lambda t: F.array_contains(toks, t).cast("int"))
    return (F.greatest(has("noindex"), has("none")),
            F.greatest(has("nofollow"), has("none")))


def robots_flags(docs: DataFrame, html_col: str = "html",
                 headers_col: str | None = None) -> DataFrame:
    """Adds ``noindex`` / ``nofollow`` boolean columns (as ints, so
    cross-engine hashing stays simple) derived from the robots meta
    directives, OR-combined with an ``X-Robots-Tag`` header value
    column when ``headers_col`` is given."""
    ni, nf = _directive_flags(robots_directives(html_col))
    if headers_col is not None:
        hdr = F.lower(F.coalesce(
            F.col(headers_col).cast("string"), F.lit("")))
        hni, hnf = _directive_flags(hdr)
        ni = F.greatest(ni, hni)
        nf = F.greatest(nf, hnf)
    return docs.withColumn("noindex", ni).withColumn("nofollow", nf)


def drop_noindex(docs: DataFrame, html_col: str = "html",
                 headers_col: str | None = None) -> DataFrame:
    """The curation gate: keep only pages whose authors did not opt
    out of indexing (meta tag, plus X-Robots-Tag when supplied).
    Pure map-side filter — the predicate pushes into the scan's
    filter stage, zero shuffle."""
    return robots_flags(docs, html_col, headers_col).filter(
        F.col("noindex") == 0).drop("noindex", "nofollow")
