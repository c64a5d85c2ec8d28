"""Flood-bucket capping for block-then-verify near-dup operators.

Every LSH-style blocker in this engine (MinHash banding, SimHash
bands, hyperplane buckets, dHash bands) self-joins rows inside small
buckets.  Degenerate web-scale inputs flood single buckets —
boilerplate-identical pages share one MinHash band key, solid-color
images all hash to dHash 0 — and an uncapped flooded bucket makes the
self-join quadratic.

Earlier rounds bounded the *join* with a per-bucket rank cap
(``row_number() over Window.partitionBy(bucket)``), but the ranking
window is itself a skew funnel: a window cannot partially aggregate,
so every member of a flooded bucket ships to ONE reducer task before
the cap applies (the exact argument ``operators/paradedup.py`` makes
for paragraph hashes).  At 10^8 members that lone task is the job's
wall clock.

This module replaces the rank with a two-phase, fully partial-agg
shape:

1. ``groupBy(bucket).count()`` — map-side combinable; the shuffle
   carries one (bucket, count) row per bucket per partition, never
   the members.  Only buckets with ``count > max_bucket`` survive the
   filter (the *flooded* set — bounded above by N / max_bucket and in
   practice tiny).
2. A left join of the flooded set back onto the rows, then a
   map-side filter keeping a **deterministic hash-prefix sample**:
   ``pmod(xxhash64(id, seed), count) < max_bucket``.  Non-flooded
   rows (null count) pass untouched.

Semantics vs the old rank cap — documented recall change:

- Buckets with ``<= max_bucket`` members are EXACT, identical to
  before (they never enter the flooded set).
- Flooded buckets previously kept the first ``max_bucket`` ids by
  rank; now they keep a deterministic pseudo-random sample with
  *expected* size ``max_bucket`` (each member kept with probability
  ``max_bucket / count``).  Pair recall inside a flooded bucket is
  sampled either way; a 10^6-member bucket is boilerplate by
  definition, and every caller verifies candidates exactly
  afterwards, so sampled floods can add no false positives.

Scale shape: two Exchanges of scalar rows (the count shuffle and the
join), both partial-agg / AQE-skew-splittable; no Window anywhere.
The join side is left unhinted — AQE broadcasts the flooded set when
it is small (the normal case) and falls back to a skew-split
shuffle join in the adversarial many-floods case, where a forced
broadcast could OOM the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COUNT_COL = "_flood_n"


def cap_flooded_buckets(df: DataFrame, bucket_cols: Sequence[str],
                        id_col: str, max_bucket: int,
                        seed: int = 0x5EED) -> DataFrame:
    """Bound every (bucket_cols) group of ``df`` to ~``max_bucket``
    rows without a rank window.

    Groups at or under the cap are returned exactly; larger groups
    keep the deterministic hash-prefix sample described in the module
    docstring.  Output columns == input columns.
    """
    if max_bucket < 1:
        raise ValueError("max_bucket must be >= 1")
    bucket_cols = list(bucket_cols)
    flooded = (
        df.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias(_COUNT_COL))
        .filter(F.col(_COUNT_COL) > max_bucket)
    )
    joined = df.join(flooded, bucket_cols, "left")
    keep = F.col(_COUNT_COL).isNull() | (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
               F.col(_COUNT_COL)) < F.lit(max_bucket)
    )
    return joined.filter(keep).drop(_COUNT_COL)
