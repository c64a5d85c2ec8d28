"""CCNet-style language-model quality proxy — without an external
LM: a corpus-trained unigram model scores each document by mean token
log-probability, plus a rare-token fraction (junk/gibberish jumps out
on both).

Two-pass Spark-first shape for 10^12 docs:
1. vocab = groupBy(token).count() — map-side partial aggregation;
   the total token count joins back as a broadcast 1-row relation
   (no driver action);
2. tokens re-join the vocab on the token key (plain shuffle join —
   web-scale vocab is too big to broadcast, and Catalyst will
   broadcast it automatically when it isn't);
3. the per-document mean folds (pos, logp) structs in POSITION order
   (array_sort + aggregate) — the same fixed-shape ordered-fold trick
   as operators/ivf.py, so the float sum is bit-deterministic under
   any partitioning and the DuckDB oracle can mirror it exactly
   (ln() is bit-identical across Spark/DuckDB/libm on this platform,
   verified in tests).

Per-doc collect_list is bounded by document length — never corpus-
sized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_quality(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    rare_threshold: int = 2) -> DataFrame:
    """(id, n_tokens, rare_frac, mean_logprob) per document.

    ``mean_logprob`` = mean over tokens of ln(corpus_count/total);
    ``rare_frac`` = fraction of tokens whose corpus count is <=
    ``rare_threshold``."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " "))
        .alias("pos", "tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    scored = (
        toks.join(vocab, "tok")
        .join(F.broadcast(total))
        .select(
            id_col, "pos",
            F.log(F.col("cnt").cast("double")
                  / F.col("_total").cast("double")).alias("lp"),
            (F.col("cnt") <= rare_threshold).cast("long").alias("rare"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("_n"),
            F.sum("rare").alias("_rare"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, lp))), "
                "cast(0.0 as double), (acc, s) -> acc + s.lp)"
            ).alias("_lpsum"),
        )
        .select(
            id_col,
            F.col("_n").cast("int").alias("n_tokens"),
            F.round(F.col("_rare") / F.col("_n"), 6).alias("rare_frac"),
            F.round(F.col("_lpsum") / F.col("_n"), 6)
            .alias("mean_logprob"),
        )
    )
