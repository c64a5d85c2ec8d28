"""spark-submit streaming entry: continuously extract pages landing in
a directory (or run once over the backlog with --available-now).

    spark-submit jobs/stream.py --input /data/pages --output /data/out \
        --checkpoint /data/cp [--available-now] [--no-dedup]

Streaming dedup is first-arrival-wins within the watermark; reconcile
to latest-capture-wins periodically with jobs/compact.py.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pdf_to_text_extraction_service_spark.plans.session import build_session
from pdf_to_text_extraction_service_spark.streaming.stream import (
    streaming_extract,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--watermark", default="2 hours")
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--no-dedup", action="store_true")
    args = ap.parse_args()

    spark = build_session(app_name="webextract-stream")
    q = streaming_extract(
        spark, args.input, args.output, args.checkpoint,
        watermark=args.watermark,
        dedup=not args.no_dedup,
        available_now=args.available_now,
    )
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
