"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    ``min_fraction`` × the cluster's default parallelism.

    For compute-heavy per-row operators (signature kernels, feature
    extraction) a small input file is a scale trap: a 1 MB parquet
    scan is ONE partition, so the kernel runs on one core no matter
    how wide the cluster — and AQE can only coalesce partitions, never
    split them. At real scale inputs already have thousands of splits
    and this is a no-op (the partition count check is plan-local, no
    job); on small inputs the sub-ms shuffle buys full-width execution.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2.0, target * min_fraction):
        return df.repartition(target)
    return df
