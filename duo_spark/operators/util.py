"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: per-core bytes below which a compute-heavy input counts as "narrow":
#: 8 MB/core is far under the 128 MB scan-split default, so the check
#: only fires on inputs that would scan as a handful of partitions.
_SMALL_INPUT_BYTES_PER_CORE = 8 << 20


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition iff the input is too small to occupy the
    cluster (estimated bytes < cores × 8 MB × ``min_fraction`` × 2).

    For compute-heavy per-row operators (signature kernels, feature
    extraction) a small input file is a scale trap: a 1 MB parquet
    scan is ONE partition, so the kernel runs on one core no matter
    how wide the cluster — and AQE can only coalesce partitions, never
    split them. At real scale inputs are big and this is a no-op; on
    small inputs the sub-ms shuffle buys full-width execution.

    The smallness test reads the optimizer's logical size estimate
    (file-size sum for scans) — pure plan metadata. The previous form
    asked ``df.rdd.getNumPartitions()``, which forces physical
    planning + RDD DAG construction per call (~25 ms extra per fresh
    DataFrame, measurable in a hot service loop); logical stats are
    available right after analysis. Falls back to the partition-count
    check where the JVM plan is unreachable (Spark Connect).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # Connect / API drift: fall back to the RDD check
        if df.rdd.getNumPartitions() < max(2.0, target * min_fraction):
            return df.repartition(target)
        return df
    if est_bytes < target * _SMALL_INPUT_BYTES_PER_CORE * min_fraction * 2:
        return df.repartition(target)
    return df
