"""r8 optimization parity pin: the vectorized window-occurrence pass
must be row-identical to the pre-r8 interpreted per-window expression
(double array_join(slice(...)) + xxhash64 chain)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _old_window_occurrences(docs, n, id_col, text_col, with_pos):
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


def test_window_occurrences_match_old_expression(spark):
    from pdf_to_text_extraction_service_spark.operators.dupspans import (
        _window_occurrences,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    edge = spark.createDataFrame(
        [(3000, None), (3001, ""), (3002, "a b c"),
         (3003, " ".join(f"w{i}" for i in range(13))),
         (3004, " ".join(f"w{i % 4}" for i in range(30)))],
        "doc_id long, text string")
    docs = docs.unionByName(edge)
    for with_pos in (False, True):
        want = sorted(map(tuple, _old_window_occurrences(
            docs, 13, "doc_id", "text", with_pos).collect()))
        got = sorted(map(tuple, _window_occurrences(
            docs, 13, "doc_id", "text", with_pos).collect()))
        assert got == want and len(got) > 10000, with_pos


def _old_remove_duplicated_spans(docs, n=13, min_count=2,
                                 id_col="doc_id", text_col="text"):
    from pdf_to_text_extraction_service_spark.operators.dupspans import (
        _window_occurrences,
    )

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


def test_remove_duplicated_spans_matches_old_sql(spark):
    from pdf_to_text_extraction_service_spark.operators.dupspans import (
        remove_duplicated_spans,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    hdr = "shared boilerplate header repeated across many documents " \
          "again and again and again and yet again for all"
    built = docs.select(
        "doc_id",
        F.concat(F.lit(hdr + " "), F.col("text")).alias("text"))
    edge = spark.createDataFrame(
        [(4000, None), (4001, "short"),
         (4002, hdr), (4003, hdr + " " + hdr)],
        "doc_id long, text string")
    built = built.unionByName(edge)
    want = sorted(map(tuple,
                      _old_remove_duplicated_spans(built).collect()))
    got = sorted(map(tuple,
                     remove_duplicated_spans(built).collect()))
    assert got == want and len(got) > 500
    assert any(r[3] > 0 for r in got)    # removal actually happened
