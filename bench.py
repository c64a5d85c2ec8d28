"""Benchmark harness — one JSON line to stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Measured steady-state: corpus synthesis and a Python-worker warm-up
run happen OFF the clock, so timings reflect pipeline execution, not
JVM/Arrow spin-up. Extraction is measured on two tables:
- an amplified HTML page table (dup_factor captures per document →
  dedup at volume), salt disabled (uniform rows, no skew to break);
- a mixed-format corpus covering every dispatch kernel, salt enabled
  (pdf/office rows are larger: the size-tiered salt is live).

Usage:
    python bench.py              # one JSON line
    python bench.py --scaling    # add N vs N/4 cores scaling efficiency
    python bench.py --codecs-only  # just the per-codec decode table

Box-noise handling: every run embeds two controls —
``control_us_per_page`` (single-core router extraction of a fixed
deterministic page) and ``codec_us`` (per-codec decode microbenches on
fixed fixtures).  ``queries_ctrl_norm`` rescales each query median by
``_REF_CONTROL_US / control_us_per_page`` so round-over-round diffs
are one subtraction even when the shared box drifts (observed ±40%
intra-day, BENCH/BASELINE.md r6 notes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _prepare(spark, sf_dir: str, base: str) -> dict:
    """Build bench inputs (untimed)."""
    from pyspark.sql import functions as F

    from pdf_to_text_extraction_service_spark.sources.corpus import (
        generate_corpus_rows,
        load_documents,
        pages_from_documents,
    )

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_mixed = max(int(40000 * sf), 500)

    docs = load_documents(spark, sf_dir)
    n_docs = docs.count()
    dup = 8
    html_pages_path = f"{base}/html_pages"
    pages_from_documents(docs, dup_factor=dup).write.mode(
        "overwrite").parquet(html_pages_path)

    rows = generate_corpus_rows(n_mixed, seed=42)
    mixed_path = f"{base}/mixed_pages"
    spark.createDataFrame(
        rows,
        "url string, ts_off long, html binary, text string, lang string",
    ).select(
        "url",
        F.expr("timestamp '2026-01-01 00:00:00' "
               "+ make_interval(0,0,0,0,0,0, ts_off)").alias("warc_ts"),
        "html", "text", "lang",
    ).repartition(32).write.mode("overwrite").parquet(mixed_path)
    n_mixed_rows = spark.read.parquet(mixed_path).count()

    return {
        "html_pages_path": html_pages_path,
        "mixed_path": mixed_path,
        "html_docs": n_docs * dup,
        "mixed_docs": n_mixed_rows,
    }


def _warmup(spark, ctx: dict) -> None:
    from pdf_to_text_extraction_service_spark.plans.pipeline import (
        extract_pipeline,
    )

    small = spark.read.parquet(ctx["html_pages_path"]).limit(256)
    extract_pipeline(small, salt=False, keep_pages_col=False).count()


def _run_suite(spark, sf_dir: str, ctx: dict):
    from pyspark.sql import functions as F

    def F_concat_url():
        return F.concat(
            F.lit("https://corpus.example/"), F.col("source"),
            F.lit("/doc"), F.col("doc_id").cast("string"),
        ).alias("url")

    F_col, F_lit = F.col, F.lit

    import __spark_entry__ as entry_mod
    from pdf_to_text_extraction_service_spark.plans.pipeline import (
        extract_pipeline,
        flagship_lang_agg,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    from pdf_to_text_extraction_service_spark.plans.session import (
        tune_arrow_batch,
    )

    html_pages = spark.read.parquet(ctx["html_pages_path"])
    # Payload-aware Arrow batching, exactly as jobs/extract.py does
    # per input table (tuning itself is off the clock).
    tune_arrow_batch(spark, html_pages)
    t0 = time.perf_counter()
    extracted = extract_pipeline(html_pages, salt=False,
                                 keep_pages_col=False)
    flagship_lang_agg(extracted).collect()
    t1 = time.perf_counter()
    timings["extract_dedup_flagship_html"] = t1 - t0

    mixed = spark.read.parquet(ctx["mixed_path"])
    tune_arrow_batch(spark, mixed)
    t0 = time.perf_counter()
    n_out = extract_pipeline(mixed, salt=True,
                             keep_pages_col=False).count()
    t1 = time.perf_counter()
    timings["extract_mixed_all_kernels"] = t1 - t0
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    extras["mixed_rows_out"] = n_out

    total_docs = ctx["html_docs"] + ctx["mixed_docs"]
    total_extract_time = (timings["extract_dedup_flagship_html"]
                          + timings["extract_mixed_all_kernels"])
    extras["docs_extracted"] = total_docs
    extras["extraction_docs_per_sec"] = total_docs / total_extract_time

    # Composed curation chain (jobs/curate.py): gate -> quality ->
    # exact/paragraph/span dedup -> pack, stats off so the timing is
    # the one-pass pipeline, not per-stage counts.
    from jobs.curate import curate
    from pdf_to_text_extraction_service_spark.sources.corpus import (
        load_documents,
    )

    cdocs = load_documents(spark, sf_dir).select(
        F_concat_url(), F_col("text"), F_lit(True).alias("success"),
        F_col("lang"),
    )
    t0 = time.perf_counter()
    out, _ = curate(spark, cdocs, seq_len=1024, stats=False)
    n_curated = out.count()
    timings["curate_chain"] = time.perf_counter() - t0
    extras["curate_rows_out"] = n_curated

    for name in ("q1_lineitem_agg", "join_topk_customers",
                 "dedup_window_events", "anti_join_manifest",
                 "dedup_minhash_lsh", "dedup_simhash",
                 "dedup_embedding_cosine", "semantic_dedup_embeddings",
                 "ann_cosine_topk",
                 "doc_fingerprint", "lang_id_heuristic",
                 "decontam_benchmark", "pack_sequences",
                 "unigram_lm_quality", "neardup_components",
                 "paragraph_dedup"):
        q = entry_mod.queries()[name]
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        timings[name] = time.perf_counter() - t0

    return timings, extras


def _bench_once(cpus: int, sf_dir: str, repeats: int = 3):
    """Per-query MEDIAN over ``repeats`` suite runs — sandbox timings
    jitter ±15% run-to-run, so round-over-round BENCH comparisons need
    medians to be signal rather than noise."""
    import statistics

    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )

    spark = build_session(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    base = tempfile.mkdtemp(prefix=f"bench-{cpus}-")
    try:
        ctx = _prepare(spark, sf_dir, base)
        _warmup(spark, ctx)
        runs = [_run_suite(spark, sf_dir, ctx) for _ in range(repeats)]
        timings = {
            k: statistics.median(t[k] for t, _ in runs)
            for k in runs[0][0]
        }
        extras = dict(runs[-1][1])
        total_docs = ctx["html_docs"] + ctx["mixed_docs"]
        med_extract = (timings["extract_dedup_flagship_html"]
                       + timings["extract_mixed_all_kernels"])
        extras["extraction_docs_per_sec"] = total_docs / med_extract
        extras["bench_repeats"] = repeats
    finally:
        spark.stop()
    return timings, extras


def _microbench_control() -> float:
    """Single-threaded router extraction of one fixed ~5.8 KB HTML
    page, run BEFORE Spark spins up (box otherwise idle).  The
    returned µs/page is the box-speed control: round-over-round suite
    deltas are interpretable only relative to it (the sandbox drifts
    ±15%+ between sessions).  Deterministic construction — corpus
    seed 7, page item25 inflated with two other pages' bodies — so
    the number is comparable across rounds."""
    import re

    from pdf_to_text_extraction_service_spark.kernel.router import (
        extract_document,
    )
    from pdf_to_text_extraction_service_spark.sources.corpus import (
        generate_corpus_rows,
    )

    rows = {r[0]: r[2] for r in generate_corpus_rows(60, seed=7)}
    base = rows["https://corpus.example/pages/item25.html"]
    extra = b""
    for u in ("https://corpus.example/pages/item26.html",
              "https://corpus.example/pages/item27.html"):
        body = rows.get(u, b"")
        m = re.search(rb"<body[^>]*>(.*)</body>", body, re.DOTALL)
        if m:
            extra += m.group(1)
    page = base.replace(b"</body>", extra + b"</body>")
    url = "https://corpus.example/pages/control.html"
    extract_document(url, page)              # warm imports/regexes
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        extract_document(url, page)
    dt = time.perf_counter() - t0
    return dt / n * 1e6


# Reference control speed for cross-round normalization: the r6
# driver session measured 265.742 µs/page on this box.  All future
# rounds report raw medians AND medians rescaled to this anchor
# (queries_ctrl_norm), so a session where the shared box runs 1.4x
# slower still produces comparable per-query numbers.
_REF_CONTROL_US = 265.742


def _codec_microbench() -> dict:
    """Per-codec decode throughput on fixed deterministic fixtures,
    run single-threaded before Spark spins up.  Prices the pure-
    Python serial decoders (MQ/EBCOT/fax bit loops) for a 100-TB
    corpus-mix cost model and validates the decode-bomb budgets
    against measured numbers (VERDICT r6 next #3).

    Returns {codec: {"us": median µs/decode, "px": pixels decoded}}
    (audio rows use "samples" instead of "px").  Fixture content is
    seeded so the numbers are comparable across rounds."""
    import statistics

    import numpy as np

    from pdf_to_text_extraction_service_spark.kernel import (
        ccitt, flacdec, imgcodec, jbig2, jp2k, vp8l,
    )

    rng = np.random.default_rng(7)
    # photo-like fixture (gradient + texture + mild grain), not pure
    # noise — decode cost is entropy-dependent for the block codecs
    # and a max-entropy page would overprice the corpus mix ~2x
    yy, xx = np.mgrid[0:256, 0:256]
    gray = ((xx + yy) // 2 + 24 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
            + rng.integers(-6, 7, (256, 256))).clip(0, 255).astype(
                np.uint8)
    rgba = np.dstack([gray, gray.T, gray[::-1], np.full_like(gray, 255)])
    # text-like bilevel page: sparse black runs on white (the fax /
    # JBIG2 decoders' cost depends on transition density, so fix it)
    bile = np.zeros((352, 288), dtype=np.uint8)
    bile[::7, :] = 1
    bile[:, ::11] ^= 1

    fixtures: dict[str, tuple] = {}
    fixtures["png"] = (imgcodec.encode_png(gray),
                       imgcodec.decode_png, gray.size)
    fixtures["jpeg_baseline"] = (imgcodec.encode_jpeg(gray),
                                 imgcodec.decode_jpeg, gray.size)
    fixtures["jpeg_progressive"] = (
        imgcodec.encode_jpeg_progressive(gray),
        imgcodec.decode_jpeg, gray.size)
    fixtures["gif"] = (imgcodec.encode_gif(gray),
                       lambda d: imgcodec._decode_gif(d), gray.size)
    fixtures["vp8l"] = (vp8l.encode_vp8l(rgba),
                        vp8l.decode_vp8l, gray.size)
    fixtures["ccitt_g4"] = (
        ccitt.encode_g4(bile),
        lambda d: ccitt.decode_g4(d, bile.shape[1], bile.shape[0]),
        bile.size)
    fixtures["jbig2_generic"] = (
        jbig2.encode_generic_region(bile),
        lambda d: jbig2.decode_generic_region(
            d, bile.shape[1], bile.shape[0]),
        bile.size)
    fixtures["jpx_53_lossless"] = (jp2k.encode_lossless(gray),
                                   jp2k.decode_jp2k, gray.size)
    if hasattr(jp2k, "encode_lossy_97"):
        fixtures["jpx_97_lossy"] = (jp2k.encode_lossy_97(gray),
                                    jp2k.decode_jp2k, gray.size)
    try:
        from pdf_to_text_extraction_service_spark.kernel import vp8
        fixtures["vp8_lossy"] = (vp8.encode_vp8(gray),
                                 vp8.decode_vp8, gray.size)
    except ImportError:
        pass

    samples = (np.sin(np.arange(44100) * 0.05) * 12000).astype(np.int16)
    fixtures["flac"] = (flacdec.encode_flac(samples, 44100),
                        flacdec.decode_flac_full, samples.size)

    out: dict[str, dict] = {}
    for name, (payload, dec, units) in fixtures.items():
        dec(payload)                       # warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            dec(payload)
            reps.append(time.perf_counter() - t0)
        key = "samples" if name == "flac" else "px"
        out[name] = {"us": round(statistics.median(reps) * 1e6, 1),
                     key: int(units)}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    codec_us = _codec_microbench()
    if "--codecs-only" in sys.argv:
        print(json.dumps({"codec_us": codec_us}))
        return
    control_us = _microbench_control()
    timings, extras = _bench_once(cpus, sf_dir)
    extras["control_us_per_page"] = control_us
    norm = _REF_CONTROL_US / control_us if control_us else 1.0
    result = {
        # `value` IS the number the metric string names (VERDICT r6
        # wrong #1): suite wall-clock seconds.  Extraction throughput
        # lives in extraction_docs_per_sec.
        "metric": "bench suite seconds (sum of 19 per-query medians; "
                  "throughput in extraction_docs_per_sec)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "queries_ctrl_norm": {k: round(v * norm, 3)
                              for k, v in timings.items()},
        "control_ref_us_per_page": _REF_CONTROL_US,
        "codec_us": codec_us,
        "sf": float(sf),
        "cpus": cpus,
        **{k: round(v, 3) for k, v in extras.items()},
    }

    if "--scaling" in sys.argv:
        lo_cpus = max(cpus // 4, 1)
        lo_t, lo_x = _bench_once(lo_cpus, sf_dir)
        hi = extras["extraction_docs_per_sec"]
        lo = lo_x["extraction_docs_per_sec"]
        result["scaling"] = {
            "cpus_lo": lo_cpus,
            "cpus_hi": cpus,
            "docs_per_sec_lo": round(lo, 3),
            "docs_per_sec_hi": round(hi, 3),
            "efficiency": round((hi / lo) / (cpus / lo_cpus), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
