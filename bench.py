"""Benchmark harness — one JSON line to stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The extraction
pipeline is measured over an amplified page table (dup_factor
replicas per document → latest-capture dedup is exercised at volume).

Usage:
    python bench.py                  # one JSON line
    python bench.py --scaling       # also run at N and 4N cores and
                                     # report scaling efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run_suite(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    import __spark_entry__ as entry_mod
    from pdf_to_text_extraction_service_spark.plans.pipeline import (
        extract_pipeline,
        flagship_lang_agg,
    )
    from pdf_to_text_extraction_service_spark.sources.corpus import (
        load_documents,
        pages_from_documents,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    docs = load_documents(spark, sf_dir)
    n_docs = docs.count()
    dup = 4
    pages = pages_from_documents(docs, dup_factor=dup)

    t0 = time.perf_counter()
    extracted = extract_pipeline(pages, keep_pages_col=False)
    out_rows = extracted.count()
    t1 = time.perf_counter()
    timings["extract_dedup_pipeline"] = t1 - t0
    extras["docs_extracted"] = n_docs * dup
    extras["docs_after_dedup"] = out_rows
    extras["extraction_docs_per_sec"] = (n_docs * dup) / (t1 - t0)

    t0 = time.perf_counter()
    extracted2 = extract_pipeline(pages, keep_pages_col=False)
    flagship_lang_agg(extracted2).collect()
    timings["flagship_lang_agg"] = time.perf_counter() - t0

    for name in ("q1_lineitem_agg", "join_topk_customers",
                 "dedup_window_events", "anti_join_manifest"):
        q = entry_mod.queries()[name]
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        timings[name] = time.perf_counter() - t0

    return timings, extras


def _bench_once(cpus: int, sf_dir: str):
    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )

    spark = build_session(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    try:
        timings, extras = _run_suite(spark, sf_dir)
    finally:
        spark.stop()
    return timings, extras


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    timings, extras = _bench_once(cpus, sf_dir)
    result = {
        "metric": "documents/sec extraction throughput "
                  "(byte-identical text per url)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
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
