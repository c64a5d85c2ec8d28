"""spark-submit batch entry: extract a pages table to an output table.

    spark-submit --driver-memory 8g --py-files engine.zip \
        jobs/extract.py \
        --input /data/pages_parquet --output /data/extracted \
        --manifest /data/manifest --buckets 64

Resumable: progress checkpoints per url-hash bucket into the manifest
table (operators/manifest.py); a SIGKILLed run re-runs only pending
buckets (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"). Verified at 1M pages: killed mid-run with 2/16
buckets committed, the rerun completed exactly the missing 14 and the
output held 1M distinct urls.

NOTE --driver-memory must be passed on the spark-submit command line
(local mode: driver == executor heap; the session builder cannot
raise it after JVM launch). With the default 1g heap, concurrent
parquet column batches + shuffle buffers over multi-KB binary cells
exhaust execution memory ("Cannot reserve additional contiguous
bytes in the vectorized reader").
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow bare `spark-submit jobs/extract.py` (no --py-files): the
# package lives next to this script's parent dir.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pdf_to_text_extraction_service_spark.operators.manifest import (
    run_resumable_extract,
)
from pdf_to_text_extraction_service_spark.plans.session import (
    build_session,
    tune_arrow_batch,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--arrow-target-mb", type=int, default=4)
    ap.add_argument("--input-format", choices=("parquet", "warc"),
                    default="parquet",
                    help="'warc' reads raw (gzipped) WARC segment "
                         "files instead of a parquet pages table")
    args = ap.parse_args()

    spark = build_session(app_name="webextract-job")
    if args.input_format == "warc":
        from pdf_to_text_extraction_service_spark.sources.warc import (
            read_warc_pages,
        )

        # stage the parsed pages to parquet ONCE: the resumable
        # bucket waves re-scan the input per wave, which is cheap
        # columnar pruning on parquet but would gunzip+parse every
        # WARC segment once per wave through the mapInPandas source
        staged = args.output.rstrip("/") + ".pages"
        read_warc_pages(spark, args.input).write.mode(
            "overwrite").parquet(staged)
        print(f"[extract] warc segments staged to {staged}")
        pages = spark.read.parquet(staged)
    else:
        pages = spark.read.parquet(args.input)
    rows = tune_arrow_batch(spark, pages, target_mb=args.arrow_target_mb)
    print(f"[extract] arrow batch tuned to {rows} rows "
          f"(~{args.arrow_target_mb} MB/batch)")
    run_resumable_extract(
        spark, pages,
        output_path=args.output,
        manifest_path=args.manifest,
        buckets=args.buckets,
        dedup=not args.no_dedup,
    )
    spark.stop()


if __name__ == "__main__":
    main()
