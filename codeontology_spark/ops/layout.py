"""Scan-parallelism guard for underpartitioned inputs.

A parquet source that arrives as one file with one row group scans as ONE
task no matter how many cores the session has (Spark can split a file by
byte range, but a range without a row-group midpoint yields an empty
task), so every per-row transform downstream of that scan — shingle
explodes, per-shingle sha256, token hashing — runs on a single core. The
optimization guide's remedy for underparallel/unsplittable input (§2.5
"input skew") is to repartition immediately after the read.

``spread`` applies that remedy *scale-adaptively*: it is a no-op whenever
the optimizer's size estimate says the input is big enough to scan with
at least ``defaultParallelism``-way parallelism anyway, which any
production-scale corpus is (100 TB arrives as ~10^5 splits). Only a
source smaller than cores x 16 MiB is re-spread, so the exchange it pays
moves under 16 MiB per core once — strictly cheaper than leaving the
whole downstream map phase single-threaded.

Implementation notes:
- The guard reads ``optimizedPlan().stats().sizeInBytes`` — a pure
  driver-side Catalyst estimate. It deliberately does NOT look at
  ``df.rdd.getNumPartitions()``: converting a DataFrame with exchanges to
  an RDD under AQE *executes* its shuffle stages eagerly just to plan the
  RDD, i.e. the "check" would run the query once before the query runs.
- The repartition hash-partitions on a real key (deterministic under
  task retry — §2.5 warns off rand()-derived keys) so that a downstream
  groupBy/join on the same key reuses the partitioning instead of adding
  a second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: spread only inputs estimated smaller than cores x this many bytes —
#: above it, a scan already parallelizes (and a blanket repartition of a
#: big input would be the §8 anti-pattern of shuffling heavy payloads)
SPREAD_BYTES_PER_CORE = 16 << 20


def est_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (optimizedPlan().stats()) — a
    pure driver-side number, no jobs. None when unavailable. Beware: a
    localCheckpoint()ed frame is a LogicalRDD whose estimate is the
    meaningless defaultSizeInBytes — take the estimate from the SOURCE
    table, not from checkpoint-derived frames."""
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j hands back a plain int for small BigInts, a Java object
        # (with toString) for huge ones
        return raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return None


def spread(df: DataFrame, key: str | None = "doc_id") -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when (and
    only when) the optimizer estimates it smaller than
    ``defaultParallelism * SPREAD_BYTES_PER_CORE``. Hash-partitions by
    ``key`` when given (round-robin when None). Results are unchanged:
    every operator this feeds aggregates with order-insensitive
    functions (min / integer sums / counts)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    size = est_bytes(df)
    if size is None:
        return df  # estimate unavailable: never risk an extra shuffle
    if size >= target * SPREAD_BYTES_PER_CORE:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
