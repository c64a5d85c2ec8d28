"""Benchmark decontamination — the GPT-3/Pile-style n-gram overlap
check every LLM training pipeline runs before training: flag any
document sharing at least one word n-gram (n=13 by default) with an
evaluation-benchmark corpus.

Spark-first shape for 10^12 docs:
- benchmark n-grams are hashed (two independent native xxhash64
  values — a 128-bit combined key makes a false hit ~1e-38 per
  pair), made DISTINCT, and **broadcast**: the benchmark side is a
  few million rows at most, so no shuffle ever touches the document
  corpus;
- document n-grams explode to (doc_id, h1, h2) scalars only — the
  n-gram STRINGS never leave the projection that hashes them;
- the hit count aggregates with map-side partial aggregation.

The hashes stay inside whole-stage codegen (xxhash64 is a native JVM
expression — an earlier interpreted char-fold polyhash made this the
slowest query in the bench suite at 4x the cost). The DuckDB oracle
joins on the n-gram STRINGS, so it verifies the results without ever
mirroring the hash (identical output up to the negligible collision
rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(tokens_col: str, n: int) -> str:
    """Distinct word n-grams of a pre-split token array column —
    standard decontamination semantics: a text with fewer than ``n``
    tokens has ZERO n-grams (no truncated pseudo-grams that would let
    short benchmark lines flag short documents)."""
    return (
        f"case when size({tokens_col}) >= {n} then "
        f"array_distinct(transform("
        f"sequence(0, size({tokens_col}) - {n}), "
        f"i -> array_join(slice({tokens_col}, i + 1, {n}), ' '))) "
        f"else array() end"
    )


def _gram_struct(tokens_col: str, n: int) -> str:
    """array<struct<h1,h2>> of the word n-gram hashes."""
    return (
        f"transform({_grams(tokens_col, n)}, s -> struct("
        f"xxhash64(s) as h1, xxhash64(s, 's2') as h2))"
    )


def benchmark_overlap(docs: DataFrame, bench: DataFrame, n: int = 13,
                      id_col: str = "doc_id", text_col: str = "text",
                      bench_text_col: str = "text") -> DataFrame:
    """Per-document contamination stats vs a benchmark corpus:
    (id, hit_ngrams, total_ngrams, overlap_frac, contaminated).

    ``hit_ngrams`` counts the document's DISTINCT n-grams that appear
    anywhere in the benchmark; ``contaminated`` is the standard
    any-hit flag. The benchmark side is broadcast (see module
    docstring) — at 100 TB the corpus never shuffles."""
    bench_grams = (
        bench.select(F.explode(F.expr(
            _gram_struct(f"split({bench_text_col}, ' ')", n)
        )).alias("_g"))
        .select("_g.h1", "_g.h2")
        .distinct()
    )
    doc_grams = (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(
                _gram_struct(f"split({text_col}, ' ')", n)
            )).alias("_g"),
        )
        .select(id_col, "_g.h1", "_g.h2")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), ["h1", "h2"])
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_ngrams"))
    )
    doc_tokens = f"split({text_col}, ' ')"
    totals = docs.select(
        F.col(id_col),
        F.expr(f"size({_grams(doc_tokens, n)})").alias("total_ngrams"),
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("hit_ngrams", F.lit(0)).cast("int")
            .alias("hit_ngrams"),
            F.col("total_ngrams").cast("int").alias("total_ngrams"),
            F.round(
                F.coalesce("hit_ngrams", F.lit(0))
                / F.greatest("total_ngrams", F.lit(1)), 6
            ).alias("overlap_frac"),
            (F.coalesce("hit_ngrams", F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )
