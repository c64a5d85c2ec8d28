"""Deterministic corpus generator CLI (FIXTURES.md §1 generation mix).

    python tools/gen_corpus.py --out /tmp/pages --n 5000 --seed 42

Writes a parquet pages table (url, warc_ts, html, text, lang) with:
~85% well-formed HTML (boilerplate nav/footer/aside/script/style to
strip), round-robin non-HTML payloads across all 17 dispatch formats,
duplicate urls with later warc_ts (dedup coverage), an oversized skew
tail, and undecodable unknown-extension rows (failure-code coverage).
Seeded — no wall clock.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--dup-rate", type=float, default=0.12)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )
    from pdf_to_text_extraction_service_spark.sources.corpus import (
        write_corpus,
    )

    spark = build_session(app_name="gen-corpus",
                          master=f"local[{args.cpus}]")
    write_corpus(spark, args.out, args.n, seed=args.seed,
                 partitions=args.partitions, dup_rate=args.dup_rate)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} rows to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
