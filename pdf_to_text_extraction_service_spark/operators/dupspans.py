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
    occurrences = (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(
                f"transform(case when size(split({text_col}, ' ')) >= {n} "
                f"then sequence(0, size(split({text_col}, ' ')) - {n}) "
                f"else array() end, "
                f"i -> struct("
                f"xxhash64(array_join(slice(split({text_col}, ' '), "
                f"i + 1, {n}), ' ')) as h1, "
                f"xxhash64(array_join(slice(split({text_col}, ' '), "
                f"i + 1, {n}), ' '), 's2') as h2))"
            )).alias("_g"),
        )
        .select(id_col, "_g.h1", "_g.h2")
    )
    dup_keys = (
        occurrences.groupBy("h1", "h2")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h1", "h2")
    )
    doc_distinct = (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(
                _gram_struct(f"split({text_col}, ' ')", n)
            )).alias("_g"),
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
