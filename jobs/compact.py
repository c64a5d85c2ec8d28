"""spark-submit compaction entry: reconcile a streamed output
directory to latest-capture-wins (see streaming/stateful.py).

    spark-submit jobs/compact.py --input /data/out --output /data/compacted
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pdf_to_text_extraction_service_spark.plans.session import build_session
from pdf_to_text_extraction_service_spark.streaming.stateful import (
    compact_streamed_output,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = build_session(app_name="webextract-compact")
    streamed = spark.read.parquet(args.input)
    compact_streamed_output(streamed).write.mode("overwrite").parquet(
        args.output
    )
    spark.stop()


if __name__ == "__main__":
    main()
