"""Extra measurement harness for optimization work (guide §1).

NOT the graded bench — bench.py is frozen for measurement.  This
file exists so per-query isolation runs, phase breakdowns and
.explain("formatted") dumps can be produced without touching bench.py.

Usage:
    python bench_extra.py q <name> [<name>...]   # time entry queries
    python bench_extra.py explain <name> <out>   # dump formatted plan

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPEATS (default 2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _session():
    from pdf_to_text_extraction_service_spark.plans.session import (
        build_session,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return build_session(app_name=f"bench-extra-{cpus}",
                         master=f"local[{cpus}]",
                         shuffle_partitions=max(cpus, 8))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    mode, args = sys.argv[1], sys.argv[2:]

    import __spark_entry__ as entry_mod

    spark = _session()
    qs = entry_mod.queries()

    if mode == "explain":
        name, out_path = args[0], args[1]
        df = qs[name](spark, sf_dir)
        with open(out_path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
        print(f"wrote {out_path}")
        return

    results: dict[str, dict] = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        results[name] = {"median": statistics.median(ts), "samples": ts}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
