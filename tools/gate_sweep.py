"""Pre-flight the driver CORRECTNESS gate: run EVERY queries() entry
against its oracle_sql() at the driver's gate scale (sf0.01 — the
pytest mimic runs at sf0.001 for speed, and hash differences can be
data-dependent), with the driver's own comparison shape
(order-insensitive, round-6 floats, tz-naive timestamps).

    python tools/gate_sweep.py [--sf-dir /root/testdata/sf0.01]

Prints one line per failing query and a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated substrings: run only queries "
                         "whose name contains one of them")
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = args.sf_dir

    import duckdb

    import __spark_entry__ as em
    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')")
    spark = build_session(master="local[16]", shuffle_partitions=16)
    failures = []
    t0 = time.time()
    oracles = em.oracle_sql()  # one call — the IVF entry trains a mirror
    wanted = args.only.split(",") if args.only else None
    n_run = 0
    for name, q in sorted(em.queries().items()):
        if wanted and not any(w in name for w in wanted):
            continue
        n_run += 1
        sql = oracles.get(name)
        try:
            got = sorted(tuple(_norm(v) for v in r)
                         for r in q(spark, args.sf_dir).collect())
            if sql is None:
                continue  # rows-only (none currently)
            want = sorted(tuple(_norm(v) for v in r)
                          for r in con.execute(sql).fetchall())
            if got != want:
                failures.append(name)
                print(f"FAIL {name}: spark {len(got)} rows vs oracle "
                      f"{len(want)}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 - report, keep going
            failures.append(name)
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "queries": n_run,
        "failures": failures,
        "sf_dir": args.sf_dir,
        "secs": round(time.time() - t0, 1),
    }))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
