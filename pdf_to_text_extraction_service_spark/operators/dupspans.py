"""Corpus-internal duplicated-span audit (ExactSubstr-lite).

Lee et al. ("Deduplicating Training Data Makes Language Models
Better") remove exact substrings repeated across a corpus via a
suffix array. This operator is the distributed AUDIT half of that
idea: slide a word n-gram window over every document, count each
distinct window corpus-wide, and report per document how much of it
consists of windows that also occur elsewhere — the signal used to
drop or rewrite dup-heavy documents.

Spark-first shape for 10^12 docs (mirrors operators/decontam.py):
- windows explode to ``(doc_id, h1, h2)`` dual-xxhash64 scalars
  inside the document's partition — window STRINGS never leave the
  hashing projection, document text never shuffles;
- corpus-wide window counts come from one groupBy on the 128-bit
  hash pair with map-side partial aggregation;
- the per-doc rollup joins doc windows to the over-threshold count
  set on the same scalar keys.

The DuckDB oracle groups on the raw window strings, so a hash
collision (≈1e-38 per pair) would fail the gate rather than hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import _gram_struct


def _window_occurrences(docs: DataFrame, n: int, id_col: str,
                        text_col: str, with_pos: bool) -> DataFrame:
    """(id, [pos,] h1, h2) for EVERY window occurrence. The token
    array is materialized ONCE per row (`_toks` projection) and
    referenced inside the per-window lambda — re-splitting the text
    inside the lambda would be O(tokens²) per document (the same
    hoist neardup.shingles_from_tokens documents)."""
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    expr = (
        f"transform(case when size(_toks) >= {n} "
        f"then sequence(0, size(_toks) - {n}) else array() end, "
        f"i -> struct("
        f"xxhash64(array_join(slice(_toks, i + 1, {n}), ' ')) as h1, "
        f"xxhash64(array_join(slice(_toks, i + 1, {n}), ' '), 's2') "
        f"as h2))"
    )
    if with_pos:
        return toks.select(
            F.col(id_col),
            F.posexplode(F.expr(expr)).alias("pos", "_g"),
        ).select(id_col, "pos", "_g.h1", "_g.h2")
    return toks.select(
        F.col(id_col), F.explode(F.expr(expr)).alias("_g"),
    ).select(id_col, "_g.h1", "_g.h2")



def duplicated_span_stats(docs: DataFrame, n: int = 13,
                          min_count: int = 2,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-document duplicated-window stats:
    ``(id, dup_windows, total_windows, dup_frac, dup_heavy)``.

    A window is "duplicated" when its corpus-wide occurrence count
    (counting every occurrence, including repeats inside one doc)
    reaches ``min_count``. ``dup_windows`` counts the document's
    DISTINCT windows that are duplicated; ``dup_heavy`` flags docs
    with dup_frac >= 0.5 (the common drop threshold)."""
    # every occurrence (NOT distinct-per-doc) so within-doc repetition
    # counts toward min_count, like a suffix array would see it
    occurrences = _window_occurrences(docs, n, id_col, text_col,
                                      with_pos=False)
    dup_keys = (
        occurrences.groupBy("h1", "h2")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h1", "h2")
    )
    doc_distinct = (
        docs.select(F.col(id_col),
                    F.split(F.col(text_col), " ").alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(F.expr(_gram_struct("_toks", n))).alias("_g"),
        )
        .select(id_col, "_g.h1", "_g.h2")
    )
    dup_per_doc = (
        doc_distinct.join(dup_keys, ["h1", "h2"])
        .groupBy(id_col)
        .agg(F.count("*").alias("dup_windows"))
    )
    totals = docs.select(
        F.col(id_col),
        F.greatest(
            F.size(F.split(F.col(text_col), " ")) - F.lit(n - 1),
            F.lit(0),
        ).alias("total_windows"),
    )
    return (
        totals.join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_windows", F.lit(0)).cast("int")
            .alias("dup_windows"),
            F.col("total_windows").cast("int").alias("total_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0))
                / F.greatest("total_windows", F.lit(1)), 6
            ).alias("dup_frac"),
            (F.coalesce("dup_windows", F.lit(0))
             >= F.greatest("total_windows", F.lit(1)) * 0.5)
            .alias("dup_heavy"),
        )
    )


def remove_duplicated_spans(docs: DataFrame, n: int = 13,
                            min_count: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The REMOVAL half of ExactSubstr dedup: rewrite each document
    dropping every token covered by a duplicated window occurrence
    that is not the window's corpus-wide FIRST occurrence (canonical
    = min (doc_id, pos)). Returns
    ``(id_col, text_out, n_tokens, n_removed)``.

    Exact rule (mirrored by the oracle): token t of doc d is removed
    iff some occurrence (d, pos) of a window with corpus count >=
    min_count covers it (pos <= t < pos+n) AND (d, pos) is not that
    window's canonical occurrence. A canonical occurrence's tokens
    can still be removed when another, non-canonical window overlaps
    them — the "keep the first copy, drop the rest" approximation at
    fixed window size.

    Scale shape: same as duplicated_span_stats — only (doc_id, pos,
    h1, h2) scalars shuffle; removal positions roll up per doc as a
    sorted int array, and the text crosses exactly one Exchange at
    the rewrite join, where interval-merge + token filtering run
    in-row as JVM array expressions."""
    occurrences = _window_occurrences(docs, n, id_col, text_col,
                                      with_pos=True)
    dup_canon = (
        occurrences.groupBy("h1", "h2")
        .agg(F.count("*").alias("_c"),
             F.min(F.struct(F.col(id_col).alias("d"),
                            F.col("pos").alias("p"))).alias("canon"))
        .filter(F.col("_c") >= min_count)
        .select("h1", "h2", "canon")
    )
    removals = (
        occurrences.join(dup_canon, ["h1", "h2"])
        .filter(~((F.col(id_col) == F.col("canon.d"))
                  & (F.col("pos") == F.col("canon.p"))))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("rm_pos"))
    )
    toks = F.split(F.col(text_col), " ")
    # merge [pos, pos+n) intervals, then keep tokens outside them all
    intervals = F.expr(
        f"aggregate(rm_pos, cast(array() as array<struct<s:int,e:int>>), "
        f"(acc, p) -> "
        f"case when size(acc) > 0 "
        f"and element_at(acc, -1).e >= p "
        f"then concat(slice(acc, 1, size(acc) - 1), array(named_struct("
        f"'s', element_at(acc, -1).s, "
        f"'e', greatest(element_at(acc, -1).e, p + {n})))) "
        f"else concat(acc, array(named_struct('s', p, 'e', p + {n}))) "
        f"end)"
    )
    kept = F.transform(
        F.filter(
            F.transform(toks, lambda x, i: F.struct(
                i.alias("i"), x.alias("x"))),
            lambda s: ~F.exists(
                F.col("_iv"),
                lambda iv: (s["i"] >= iv["s"]) & (s["i"] < iv["e"]),
            ),
        ),
        lambda s: s["x"],
    )
    return (
        docs.join(removals, id_col, "left")
        .withColumn("_iv", F.coalesce(
            intervals,
            F.expr("cast(array() as array<struct<s:int,e:int>>)")))
        .select(
            F.col(id_col),
            F.when(F.col("rm_pos").isNull(), F.col(text_col))
            .otherwise(F.array_join(kept, " ")).alias("text_out"),
            F.size(toks).cast("int").alias("n_tokens"),
            F.coalesce(
                F.expr("aggregate(_iv, 0, (a, iv) -> a + iv.e - iv.s)"),
                F.lit(0)).cast("int").alias("n_removed"),
        )
    )
