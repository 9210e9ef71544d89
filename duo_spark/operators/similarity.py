"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): brute-force cosine top-k as the
correctness baseline, LSH-bucketed (random hyperplane) and IVF
(centroid-partitioned) variants as the scale path.

All vector math is JVM-side Column algebra (`zip_with` + `aggregate`
fold in double precision) — deterministic, codegen-friendly, and
identical element order to an SQL oracle's indexed sum. At 100 TB the
brute-force form is a single scan + TakeOrderedAndProject (no shuffle);
the LSH/IVF forms turn top-k into a bucket-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dotd(a: Column, b: Column) -> Column:
    """Dot product in double precision, element order preserved."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dotd(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dotd(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    The literal query vector is inlined into the plan (no join), so
    this is scan -> project -> TakeOrderedAndProject: embarrassingly
    parallel, zero shuffles, works unchanged at any scale.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return (
        out.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_many(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k per query for a (small) query set: broadcast the queries,
    window-rank per query. Shuffle is bounded by rows × |queries|
    pre-aggregation only within the rank window."""
    from pyspark.sql import Window

    joined = df.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------- LSH --


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bits = [
        F.when(_dotd(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def make_hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """LSH-pruned cosine top-k: scan only rows whose hyperplane bucket
    is within ``multiprobe_hamming`` bit flips of the query's bucket.

    With 8 planes + 1-probe this scans ~(1+8)/256 ≈ 3.5% of rows —
    the 100 TB path. Recall is tunable via planes/probes; exactness is
    NOT guaranteed (use cosine_topk for the oracle-checkable form).
    """
    planes = make_hyperplanes(len(query_vec), n_planes, seed)
    qb = 0
    for i, p in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if dot >= 0:
            qb |= 1 << i
    probe = [qb]
    if multiprobe_hamming >= 1:
        probe += [qb ^ (1 << i) for i in range(n_planes)]
    bucketed = df.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------- IVF --


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (inlined literals —
    centroid count is small by construction). Persisting the result
    partitioned by _cell turns ANN into partition-pruned scans."""
    best = F.lit(-1)
    best_sim = F.lit(float("-inf"))
    for i, c in enumerate(centroids):
        sim = cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        better = sim > best_sim
        best = F.when(better, F.lit(i)).otherwise(best)
        best_sim = F.when(better, sim).otherwise(best_sim)
    return df.withColumn("_cell", best)
