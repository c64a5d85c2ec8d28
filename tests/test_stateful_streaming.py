"""applyInPandasWithState host counters + streamed-output compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_text_extraction_service_spark.sources import corpus
from pdf_to_text_extraction_service_spark.streaming.stateful import (
    compact_streamed_output,
    host_crawl_stats,
)
from pdf_to_text_extraction_service_spark.streaming.stream import (
    PAGES_SCHEMA,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "url string, ts_off long, html binary, text string, lang string"
    ).select(
        "url",
        F.expr("timestamp '2026-01-01 00:00:00' "
               "+ make_interval(0,0,0,0,0,0, ts_off)").alias("warc_ts"),
        "html", "text", "lang",
    )
    df.write.mode("append").parquet(path)


def test_host_crawl_stats_state_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")

    _write_batch(spark, in_dir, [
        ("https://a.test/1.html", 0, b"<p>x</p>", None, "en"),
        ("https://a.test/2.html", 1, b"<p>yy</p>", None, "en"),
        ("https://b.test/1.html", 2, b"<p>zzz</p>", None, "en"),
    ])

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    q = (
        host_crawl_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # second micro-batch run: state must carry over (a.test -> 3 pages)
    _write_batch(spark, in_dir, [
        ("https://a.test/3.html", 3, b"<p>www</p>", None, "en"),
    ])
    stream2 = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    q2 = (
        host_crawl_stats(stream2)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    # latest state row per host
    latest = {r["host"]: r for r in out.orderBy("batches").collect()}
    assert latest["a.test"]["pages"] == 3
    assert latest["a.test"]["batches"] == 2  # state survived restart
    assert latest["b.test"]["pages"] == 1


def test_compact_streamed_output(spark):
    rows = corpus.generate_corpus_rows(80, seed=9)
    df = spark.createDataFrame(
        rows, "url string, ts_off long, html binary, text string, lang string"
    ).select(
        "url",
        F.expr("timestamp '2026-01-01 00:00:00' "
               "+ make_interval(0,0,0,0,0,0, ts_off)").alias("warc_ts"),
        "lang",
    )
    compacted = compact_streamed_output(df)
    assert compacted.count() == df.select("url").distinct().count()


def test_bitemporal_amendments_restart_and_stale(spark, tmp_path):
    """latest_capture_amendments: newer captures amend, stale late
    arrivals are ignored, state survives a checkpoint restart, and
    the folded view equals batch latest-wins dedup."""
    from pdf_to_text_extraction_service_spark.streaming.stateful import (
        fold_amendments,
        latest_capture_amendments,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")

    def run():
        stream = spark.readStream.schema(PAGES_SCHEMA) \
            .option("maxFilesPerTrigger", 1).parquet(in_dir)
        q = (
            latest_capture_amendments(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _write_batch(spark, in_dir, [
        ("https://a.test/x.html", 600, b"", "v1", "en"),
        ("https://b.test/y.html", 100, b"", "b", "en"),
    ])
    run()

    # restart with: a stale late arrival for A, a new url C, and a
    # genuinely newer A capture
    _write_batch(spark, in_dir, [
        ("https://a.test/x.html", 300, b"", "stale", "en"),
        ("https://c.test/z.html", 50, b"", "c", "en"),
    ])
    _write_batch(spark, in_dir, [
        ("https://a.test/x.html", 900, b"", "v2", "en"),
    ])
    run()

    amends = spark.read.parquet(out_dir)
    by_url = {}
    for r in amends.collect():
        by_url.setdefault(r["url"], []).append(r)
    # stale 300s arrival must not have produced an amendment
    a_texts = {r["text"] for r in by_url["https://a.test/x.html"]}
    assert "stale" not in a_texts and "v2" in a_texts
    assert max(r["amend_seq"] for r in by_url["https://a.test/x.html"]) == 2
    assert len(by_url["https://b.test/y.html"]) == 1
    assert len(by_url["https://c.test/z.html"]) == 1

    folded = {r["url"]: r["text"]
              for r in fold_amendments(amends).collect()}
    assert folded == {
        "https://a.test/x.html": "v2",
        "https://b.test/y.html": "b",
        "https://c.test/z.html": "c",
    }


def test_amendments_null_text_batch(spark, tmp_path):
    """A url batch containing a null-text capture must not kill the
    streaming task (regression: the within-batch winner comparison
    used the stored raw text, so str > None raised TypeError)."""
    from pdf_to_text_extraction_service_spark.streaming.stateful import (
        latest_capture_amendments,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    _write_batch(spark, in_dir, [
        ("https://n.test/x.html", 100, b"", None, "en"),
        ("https://n.test/x.html", 100, b"", "real", "en"),
        ("https://n.test/x.html", 50, b"", None, "en"),
    ])
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    q = (
        latest_capture_amendments(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    # same-timestamp tie resolves to the lexicographically larger
    # text ("real" > "" from None), matching the batch dedup rule
    assert len(rows) == 1 and rows[0]["text"] == "real"
