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

from duo_spark.operators.util import ensure_parallelism


def _lit_double_array(values: list[float]) -> Column:
    """Literal array<double> built in ONE py4j round trip — an F.expr
    SQL array of CAST('<repr>' AS DOUBLE) terms — instead of one
    F.lit call per element. Python's repr round-trips IEEE doubles
    exactly and Catalyst constant-folds the casts to the same Literal
    values, so the column is BIT-identical to
    ``F.array(*[F.lit(float(x)) for x in values])`` (pinned in
    tests); construction drops from ~65 socket round trips to one,
    which was a measurable slice of ANN query latency (the plan
    build for a 64-dim query vector cost ~33 ms per array, ×8 planes
    in hyperplane_bucket)."""
    body = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in values)
    return F.expr(f"array({body})")


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


def _cosine_qlit(vec: Column, qvec: list[float]) -> Column:
    """``cosine(vec, <literal query>)`` with the query's norm folded at
    plan-build time: the Python accumulation below replays _dotd's
    sequential left fold over the same doubles, so the result is
    BIT-IDENTICAL to ``cosine(vec, F.array(*lits))`` while removing a
    64-element fold per row (a third of the scoring expression — both
    per-row CPU and Janino codegen size)."""
    import math

    q = _lit_double_array(qvec)
    acc = 0.0
    for x in qvec:
        acc += float(x) * float(x)
    return _dotd(vec, q) / (_norm(vec) * F.lit(math.sqrt(acc)))


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
    out = df
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return (
        out.select(
            F.col(id_col), _cosine_qlit(F.col(vec_col), query_vec).alias("cosine")
        )
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
    """Top-k per query for a (small) query set, two-phase.

    Phase 1 (map-side): broadcast the queries, score every (row, query)
    pair, and reduce to the top-k per (query, input-partition) with a
    ``collect_list → sort_array → slice`` aggregate keyed on
    ``spark_partition_id()``. Phase 2 re-ranks only the k×partitions
    survivors per query. Shuffle volume is O(|Q| · k · partitions) —
    never the n×|Q| scored rows, and never a single-partition global
    sort per query (the scale flaw of the naive window form at 10⁹
    rows: one sorted partition per query_id).

    Ordering matches ``cosine_topk``: cosine DESC, id ASC tiebreak
    (encoded as an ascending struct sort on (-cosine, id)).
    """
    df = ensure_parallelism(df)
    scored = df.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    return _topk_two_phase(scored, k, id_col, query_id_col)


def _topk_two_phase(scored: DataFrame, k: int, id_col: str, query_id_col: str) -> DataFrame:
    """Partial/final top-k per query over (query_id, id, cosine, _pid)
    scored rows — the shared reduction of cosine_topk_many/ivf_search."""
    key = F.struct(
        (-F.col("cosine")).alias("_neg"),
        F.col(id_col).alias("_id"),
        F.col("cosine").alias("_cos"),
    )
    topk_agg = F.slice(F.sort_array(F.collect_list(key)), 1, k).alias("_top")
    partial = scored.groupBy(query_id_col, "_pid").agg(topk_agg)
    survivors = partial.select(query_id_col, F.explode("_top").alias("_s")).select(
        query_id_col,
        F.col("_s._neg").alias("_neg"),
        F.col("_s._id").alias(id_col),
        F.col("_s._cos").alias("cosine"),
    )
    final = survivors.groupBy(query_id_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("_neg"), F.col(id_col).alias("_id"), F.col("cosine").alias("_cos"))
                )
            ),
            1,
            k,
        ).alias("_top")
    )
    return final.select(query_id_col, F.posexplode("_top").alias("_pos", "_s")).select(
        query_id_col,
        F.col("_s._id").alias(id_col),
        F.col("_s._cos").alias("cosine"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


# ---------------------------------------------------------------- LSH --


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bits = [
        F.when(_dotd(vec_col, _lit_double_array(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
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


def _query_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    qb = 0
    for i, p in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    return qb


def lsh_table_buckets(
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> Column:
    """All ``n_tables`` sign-buckets of a vector in ONE pass — an
    Arrow-batched Pandas UDF doing a single (batch × dim) @ (dim ×
    n_tables·n_planes) float64 matmul, then packing sign bits per
    table. Returns ``array<long>`` of length ``n_tables``.

    Why a UDF when hyperplane_bucket is pure Column algebra: each
    Column-side plane dot is its own zip_with+aggregate fold over the
    vector, so L tables × P planes = L·P array folds per row — 32
    folds made the probed query 4× SLOWER than brute force (one fold).
    The matmul computes the same 2048 multiply-adds per row at numpy
    memory bandwidth and amortizes Python crossing over Arrow batches.
    Bit j of table t is set iff dot(v, plane_{t,j}) >= 0 in float64 —
    numerically identical to hyperplane_bucket's double fold (same
    left-to-right element order via np.dot on contiguous float64).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_all = np.array(
        [
            p
            for t in range(n_tables)
            for p in make_hyperplanes(dim, n_planes, seed + t)
        ],
        dtype=np.float64,
    ).T  # dim × (n_tables*n_planes)
    weights = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    def _buckets(v):  # pd.Series[array<float>] -> pd.Series[list[int]]
        mat = np.array([np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64)
        bits = (mat @ planes_all) >= 0.0  # batch × (L*P)
        per_table = bits.reshape(len(v), n_tables, n_planes)
        packed = (per_table * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(packed))

    return pandas_udf(_buckets, "array<long>")(F.col(vec_col))


def lsh_candidate_condition(
    query_vec: list[float],
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe_hamming: int = 2,
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> Column:
    """The candidate predicate shared by the operator and its tests: a
    row qualifies iff for SOME table its sign-bucket is within
    ``multiprobe_hamming`` bit flips of the query's bucket
    (``bit_count(bucket XOR q_bucket) <= r``). If ``bucket_col`` names
    a precomputed array<long> column (the 100 TB pattern: materialize
    once at ingest, partition by table-0's bucket), it is used
    directly; otherwise buckets are computed in-query via
    lsh_table_buckets."""
    dim = len(query_vec)
    buckets = (
        F.col(bucket_col)
        if bucket_col is not None
        else lsh_table_buckets(dim, n_planes, n_tables, seed, vec_col)
    )
    cond = None
    for t in range(n_tables):
        qb = _query_bucket(query_vec, make_hyperplanes(dim, n_planes, seed + t))
        hit = (
            F.bit_count(F.element_at(buckets, t + 1).bitwiseXOR(F.lit(qb)))
            <= F.lit(multiprobe_hamming)
        )
        cond = hit if cond is None else (cond | hit)
    return cond


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe_hamming: int = 2,
    exclude_ids: list[int] | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """LSH-pruned cosine top-k: multi-table hyperplane LSH with
    Hamming-ball multiprobe.

    Candidates (see lsh_candidate_condition) are ranked by EXACT
    cosine, so the result is exactly the brute-force top-k restricted
    to the candidate set; pruning can cost recall, never correctness.

    Recall: for a neighbor at angle θ each plane flips with p = θ/π,
    so per-table P(dist≤r) = Σ_{i≤r} C(n,i)p^i(1-p)^(n-i) and a miss
    needs ALL tables to miss — at cosine 0.97 (p≈0.078, 8 planes,
    r=2, 4 tables) the miss probability is ~1e-6. One 8-plane table
    with r=1 gave recall 0.3 on clustered data; multi-table OR +
    radius-2 probe is the standard fix.

    Cost: each table's radius-2 ball covers (1+8+28)/256 ≈ 14% of
    buckets; 4 tables OR'd scan ≲ 45% worst-case but far less on real
    clustered data where tables agree. Signature computation is one
    Arrow matmul pass (lsh_table_buckets); at 100 TB precompute that
    column once at ingest (``bucket_col=``) and partition by table-0's
    bucket so the dominant probe prunes at the file level.
    """
    out = df
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    cond = lsh_candidate_condition(
        query_vec, n_planes, n_tables, seed, multiprobe_hamming, vec_col, bucket_col
    )
    return (
        out.filter(cond)
        .select(
            F.col(id_col), _cosine_qlit(F.col(vec_col), query_vec).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: hard cap on the driver-resident matrix the exact all-pairs baseline
#: may collect (n·dim·8 bytes). 2 GiB fits the default 8 GiB driver
#: with the score blocks and broadcast copy on top; anything larger
#: must use the distributed LSH path.
EXACT_PAIRS_MAX_MATRIX_BYTES = 2 << 30


def _exact_pairs_blocked(
    df: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """All-pairs cosine >= threshold with id_a < id_b, as a blocked
    matrix multiply: the full normalized matrix is broadcast once and
    each partition's row block multiplies against it in BLAS
    (mapInPandas), so per-pair cost is a fused float64 FMA instead of a
    codegen'd zip_with lambda — ~30× faster than the nested-loop join
    form at 20k vectors (81 s → under 3 s at sf0.1) with identical
    output. Still O(n²) work and one driver-resident copy of the
    matrix (n·dim·8 bytes): the documented bounded-baseline contract —
    the LSH method is the scale path.

    The result is materialized EAGERLY (localCheckpoint) so the matrix
    broadcast can be destroyed before returning — a service loop
    calling this per corpus would otherwise pin one matrix broadcast
    per call for the session lifetime. The returned plan's checkpoint
    blocks are the caller's to release (checkpoint_scope), like every
    other eager operator here. Ids keep their native (orderable) type;
    `<` matches the previous join form's semantics.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    id_dt = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_dt}, id_b {id_dt}, cosine double"
    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # fail fast instead of OOMing the driver: the collect below
    # materializes an n×dim float64 matrix driver-side, and "bounded
    # baseline" is a contract the caller can violate by accident. One
    # cheap aggregate sizes the input before anything is collected.
    n, dim = src.agg(
        F.count(F.lit(1)), F.max(F.size("_v"))
    ).first()
    est_bytes = int(n or 0) * int(dim or 0) * 8
    if est_bytes > EXACT_PAIRS_MAX_MATRIX_BYTES:
        raise ValueError(
            f"embedding_near_dup_pairs(method='exact'): input matrix "
            f"~{est_bytes >> 20} MiB ({n} rows × dim {dim}) exceeds the "
            f"{EXACT_PAIRS_MAX_MATRIX_BYTES >> 20} MiB driver cap — the "
            f"exact method is an O(n²) driver-broadcast baseline; use "
            f"method='lsh' for inputs at this scale."
        )
    rows = src.collect()  # bounded by the method's contract + cap above
    if not rows:
        return spark.createDataFrame([], out_schema)
    integral = id_dt in ("bigint", "int", "smallint", "tinyint")
    ids = (
        np.fromiter((r._id for r in rows), dtype=np.int64, count=len(rows))
        if integral
        else np.array([r._id for r in rows], dtype=object)
    )
    m = np.array([r._v for r in rows], dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
    bc = spark.sparkContext.broadcast((ids, mn))
    thr = float(threshold)

    def gen(batches):
        ids_all, mn_all = bc.value
        # bound the score block to ~32M doubles regardless of n
        chunk = max(1, (32 << 20) // max(len(ids_all), 1))
        for pdf in batches:
            if pdf.empty:
                continue
            bid = (
                pdf["_id"].to_numpy(np.int64)
                if integral
                else pdf["_id"].to_numpy(object)
            )
            a = np.array(list(pdf["_v"]), dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                an = a / np.sqrt((a * a).sum(axis=1))[:, None]
            for lo in range(0, len(bid), chunk):
                blk = an[lo : lo + chunk]
                s = blk @ mn_all.T
                with np.errstate(invalid="ignore"):
                    mask = (s >= thr) & (ids_all[None, :] > bid[lo : lo + chunk, None])
                ia, ib = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "id_a": bid[lo + ia],
                        "id_b": ids_all[ib],
                        "cosine": s[ia, ib],
                    }
                )

    out = src.mapInPandas(gen, out_schema).localCheckpoint(eager=True)
    bc.destroy()
    return out


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    bands: int = 16,
    planes_per_band: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    method="exact": all-pairs self-join — the oracle-checkable
    baseline; O(n²), use only on bounded inputs (a dedup gate run, a
    sampled validation set).

    method="lsh": hyperplane-signature banding — the 100 TB path. Each
    band hashes the vector's sign pattern on ``planes_per_band`` random
    hyperplanes; a pair is a candidate iff some band's full sign
    pattern matches (p_band = (1 - theta/pi)^r), then candidates are
    verified with EXACT cosine, so precision is 1 and recall is
    1-(1-p_band)^bands — e.g. ~1-6e-9 at cosine 0.99 with 16x8. The
    join fans out only within same-signature buckets, never all pairs.
    """
    if method == "exact":
        return _exact_pairs_blocked(df, threshold, id_col, vec_col)
    assert method == "lsh", method
    if dim is None:
        # NOTE: inferring dim runs an eager driver-side job on an
        # otherwise lazy builder; pass dim explicitly in pipelines.
        head = df.select(vec_col).first()
        if head is None or head[0] is None:
            raise ValueError(
                "embedding_near_dup_pairs(method='lsh'): cannot infer vector "
                "dim from an empty DataFrame — pass dim= explicitly"
            )
        dim = len(head[0])
    sigs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    banded = sigs.select(
        "_id",
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        hyperplane_bucket(
                            F.col("_v"),
                            make_hyperplanes(dim, planes_per_band, seed + band),
                        ).alias("key"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_v", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._v").alias("_va"), F.col("b._v").alias("_vb"))
        .distinct()
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------- IVF --


def _centroid_sims_udf(centroids: list[list[float]], vec_col: str):
    """pandas UDF: cosine of each row vector against every centroid in
    ONE (batch × dim) @ (dim × n_cells) float64 matmul. Centroid count
    is small by construction, so the result array is tiny per row.

    Why not Column folds: n_cells fold-cosines inlining n_cells × dim
    double literals recompile (Janino) on every invocation — AQE
    re-plans give fresh exprIds, so the codegen cache never hits and
    the fixed cost dwarfs the actual math (the simhash/LSH lesson).
    Selection (argmax / top-nprobe) tolerates the ~1e-16 summation-
    order difference vs the fold; final reported cosines stay on the
    exact Column form.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def _sims(v):  # pd.Series[array<float>] -> pd.Series[list[float]]
        mat = np.array([np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        sims = (mat / norms) @ Cn.T
        return pd.Series(list(sims))

    # asNondeterministic: the optimizer pushes the isnotnull filter of
    # a downstream join/explode key (e.g. ivf's _cell) BELOW the
    # projection and re-evaluates the UDF on both sides of it — the
    # committed ivf_search/kmeans plans showed ArrowEvalPython → Filter
    # → ArrowEvalPython over one scan, i.e. every corpus row paid the
    # centroid matmul twice (guide §4.4). The function is pure; the
    # marker only forbids duplicating/reordering it. Callers apply
    # their own row filters upstream, so nothing legitimate is blocked.
    return pandas_udf(_sims, "array<double>").asNondeterministic()(F.col(vec_col))


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (first-max tiebreak).
    Persisting the result partitioned by _cell turns ANN into
    partition-pruned scans."""
    sims = _centroid_sims_udf(centroids, vec_col)
    # array_position finds the FIRST occurrence -> first-max tiebreak,
    # identical to a sims[1] >= sims[2..] CASE chain
    return df.withColumn(
        "_cell",
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int"),
    )


def ivf_probe_cells(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 2,
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """One row per (query, probed cell): the ``nprobe`` centroids
    nearest to each query vector, ordered sim DESC with cell-index
    tiebreak (stable argsort on -sim)."""
    sims = _centroid_sims_udf(centroids, query_vec_col)
    keys = F.transform(
        sims,
        lambda s, i: F.struct((-s).alias("_neg"), i.cast("int").alias("_cell")),
    )
    return queries.withColumn(
        "_cell", F.explode(F.slice(F.sort_array(keys), 1, nprobe)["_cell"])
    )


def ivf_search(
    df: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF ANN: brute-force top-k restricted to each query's ``nprobe``
    nearest centroid cells.

    The scale path behind ivf_assign: with the table persisted
    partitioned by ``_cell``, the cell equi-join below becomes a
    partition-pruned scan touching nprobe/n_cells of the data; here the
    assignment is computed inline so the operator is self-contained.
    The probed (query, cell) pairs are broadcast — data never shuffles
    for candidate generation — and the reduction is the same
    O(|Q|·k·partitions) two-phase top-k as cosine_topk_many, so no
    global per-query sort exists at any scale. Deterministic given the
    centroids: cells and probe order tiebreak on index, top-k on id.
    """
    assigned = ivf_assign(df, centroids, vec_col)
    probed = ivf_probe_cells(queries, centroids, nprobe, query_vec_col)
    scored = assigned.join(F.broadcast(probed), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    return _topk_two_phase(scored, k, id_col, query_id_col)


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-7,
) -> list[list[float]]:
    """Distributed Lloyd iterations (cosine assignment) training IVF
    centroids — the missing front half of ivf_assign/ivf_search, which
    take centroids as given.

    init = the k lowest-``id_col`` vectors (deterministic, the same
    rule the ivf_* gate queries use). Each iteration runs ONE
    assignment pass (the ivf_assign pandas-UDF matmul) and ONE
    elementwise-mean aggregate keyed (cell, position): partial
    aggregation caps the shuffle at k x dim rows per map partition,
    and only k x dim (sum, count) summary rows ever reach the driver,
    so the loop is driver-light at any corpus size — the iterative-
    algorithm shape shared with operators/graph.py. Stops at
    ``max_iter`` or when no centroid component moves more than
    ``tol``.

    Means are NOT re-normalized: cosine assignment is invariant to
    centroid scale, so plain means yield the same assignments as
    spherical k-means while keeping the oracle SQL replayable. Empty
    cells keep their previous centroid.
    """
    rows = df.orderBy(id_col).select(vec_col).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds vector count {len(rows)}")
    cents = [[float(x) for x in r[0]] for r in rows]
    dim = len(cents[0])
    for _ in range(max_iter):
        assigned = ivf_assign(df, cents, vec_col)
        stats = (
            assigned.select(
                "_cell", F.posexplode(F.col(vec_col)).alias("_p", "_v")
            )
            .groupBy("_cell", "_p")
            .agg(
                F.sum(F.col("_v").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        sums: dict[tuple[int, int], float] = {}
        counts: dict[int, int] = {}
        for r in stats:
            sums[(r["_cell"], r["_p"])] = r["_s"]
            counts[r["_cell"]] = r["_n"]
        shift = 0.0
        new = []
        for c in range(k):
            if counts.get(c):
                m = [sums[(c, p)] / counts[c] for p in range(dim)]
            else:
                m = cents[c]
            shift = max(shift, max(abs(a - b) for a, b in zip(m, cents[c])))
            new.append(m)
        cents = new
        if shift <= tol:
            break
    return cents


# ----------------------------------------------------- semantic dedup --


def _within_cell_pairs(
    assigned: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold among rows sharing
    a ``_cell``, one numpy matmul per cell via applyInPandas (Arrow
    group transfer) — each cell's similarity matrix never leaves its
    task. Row blocks of 1024 bound the in-flight S-block at
    1024 x |cell| doubles for large cells. Emits only surviving id
    pairs, so the output is answer-proportional.

    Float note: numpy's pairwise-summation dot differs from a
    sequential fold only at ~1e-15 relative — callers gate against
    SQL oracles on data whose threshold margin is orders of magnitude
    wider (asserted in tests/test_similarity.py).
    """
    import numpy as np
    import pandas as pd

    def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        v = np.array(pdf["_v"].to_list(), dtype=np.float64)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        outs = []
        for lo in range(0, n, 1024):
            hi = min(lo + 1024, n)
            s = vn[lo:hi] @ vn.T
            bi, bj = np.nonzero(s >= threshold)
            gi = bi + lo
            keep = gi < bj  # strict upper triangle, global positions
            a, b = ids[gi[keep]], ids[bj[keep]]
            outs.append((np.minimum(a, b), np.maximum(a, b)))
        return pd.DataFrame(
            {
                "id_a": np.concatenate([o[0] for o in outs]),
                "id_b": np.concatenate([o[1] for o in outs]),
            }
        )

    return assigned.groupBy("_cell").applyInPandas(pairs_of, "id_a long, id_b long")


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    kmeans_iter: int = 1,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", 2023).

    Pipeline: k-means partitions the corpus into ``k`` cells (trained
    here with ``kmeans_fit`` unless ``centroids`` is given), pairwise
    cosine runs ONLY within a cell, pairs >= ``threshold`` resolve to
    duplicate groups via connected components (operators/graph.py),
    and the group's minimum id is the canonical keeper.

    Output: one row per input row —
    (id_col, cell, dup_group, is_canonical).

    Scale: the all-pairs step is bounded per cell, never global — at
    100 TB you raise ``k`` so the expected cell size stays fixed
    (k ~ n / target_cell), making within-cell pairing linear in n
    overall; the cell equi-join shuffles on the cell key whose
    cardinality is k, so large k also removes key skew. Cross-cell
    near-dups are missed by design (the SemDeDup approximation).
    The assignment is one Arrow matmul per batch; pair verification
    is JVM-side Column algebra; no driver state beyond the k x dim
    centroid table.

    The reference has no embedding surface (north-star extension).
    """
    if centroids is None:
        centroids = kmeans_fit(
            df, k, vec_col=vec_col, id_col=id_col, max_iter=kmeans_iter
        )
    assigned = ivf_assign(df, centroids, vec_col).select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).alias("_v"),
        "_cell",
    )
    # the assignment feeds two branches (pair generation, final
    # labeling); checkpoint so the pandas-UDF matmul runs once. Same
    # retention trade-off as dedup.py's candidate table: the block
    # lives until the session drops it.
    assigned = assigned.localCheckpoint(eager=True)
    pairs = _within_cell_pairs(assigned, float(threshold), id_col)
    from duo_spark.operators.graph import connected_components

    labels = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "_nd"
    )
    return (
        assigned.join(labels, F.col(id_col) == F.col("_nd"), "left")
        .select(
            id_col,
            F.col("_cell").alias("cell"),
            F.coalesce(F.col("component"), F.col(id_col)).alias("dup_group"),
        )
        .withColumn("is_canonical", F.col("dup_group") == F.col(id_col))
    )


# ------------------------------------------------------- IVF index --


def build_ivf_index(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus as an IVF index: Hive-partitioned parquet
    keyed by nearest-centroid cell. This is the materialized half of
    the ANN scale story — with the table laid out by cell, a search
    touches only nprobe/n_cells of the files (Catalyst partition
    pruning; asserted in tests/test_similarity.py).

    One assignment pass (Arrow matmul) + one partitioned write whose
    shuffle is the partitionBy repartition — files per cell stay
    bounded by the writer's task count.
    """
    assigned = ivf_assign(df, centroids, vec_col)
    (
        assigned.repartition("_cell")
        .write.partitionBy("_cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_search_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN over a persisted IVF index (see build_ivf_index): the probed
    cell set is computed driver-side (bounded: |queries| x nprobe ints)
    and applied as a STATIC partition filter, so the parquet scan reads
    only the probed cells' directories — no full-table pass exists in
    the plan. Results are identical to the self-contained ivf_search
    on the same centroids (pytest-pinned).
    """
    probed = ivf_probe_cells(queries, centroids, nprobe, query_vec_col)
    cells = sorted({r["_cell"] for r in probed.select("_cell").distinct().collect()})
    indexed = spark.read.parquet(path).filter(F.col("_cell").isin(cells))
    scored = indexed.join(F.broadcast(probed), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    return _topk_two_phase(scored, k, id_col, query_id_col)


# ---------------------------------------------------------------------
# int8 quantization + exact-rescore ANN
# ---------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q[i] = round(x[i]/s),
    s = max|x|/127 — the standard 4× storage/bandwidth reduction for
    embedding tables (float32 → int8 + one float scale).

    For COSINE the scales cancel (cos(q_a, q_b) needs no dequant), so
    a quantized index answers similarity queries without touching the
    float vectors; :func:`cosine_topk_quantized` uses that for its
    coarse pass. Pure Column arithmetic, scan-side, no shuffle.
    A zero vector gets scale 1 (all-zero codes) rather than a 0/0.
    """
    v = F.col(vec_col)
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    s = F.when(max_abs > 0.0, max_abs / F.lit(127.0)).otherwise(F.lit(1.0))
    df = df.withColumn(scale_col, s)
    q = F.transform(v, lambda x: F.round(x.cast("double") / F.col(scale_col)).cast("int"))
    return df.withColumn(q_col, q)


def cosine_topk_quantized(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
) -> DataFrame:
    """Two-pass ANN over an int8-quantized table: coarse cosine on the
    int8 codes admits ``k*refine`` candidates (scan + per-partition
    heap, zero shuffle — same TakeOrderedAndProject shape as the
    float brute force, but streaming 4× fewer bytes), then the exact
    float cosine re-scores ONLY those candidates and keeps the top k.

    At 100 TB the coarse pass is the whole scan cost and the refine
    pass is k·refine rows — the quantization error only matters if a
    true top-k vector falls outside the top k·refine coarse window,
    which int8's ~0.2% code error makes vanishingly unlikely for any
    real margin; ``refine`` is the knob when it isn't.
    """
    if k <= 0 or refine < 1:
        raise ValueError("k must be positive and refine >= 1")
    import math

    qs = max(abs(float(v)) for v in query_vec) / 127.0 or 1.0
    # HALF_UP (away from zero), matching F.round / SQL round — python's
    # built-in round is banker's and would flip .5 codes cross-engine
    qq = [math.copysign(math.floor(abs(float(x) / qs) + 0.5), x) for x in query_vec]
    coarse = (
        df.select(id_col, vec_col, _cosine_qlit(F.col(q_col), qq).alias("_coarse"))
        .orderBy(F.col("_coarse").desc(), F.col(id_col).asc())
        .limit(k * refine)
    )
    return (
        coarse.select(
            F.col(id_col), _cosine_qlit(F.col(vec_col), query_vec).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def centroids_by_group(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    dim: int | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Per-group mean vector (class centroids): (group, n, centroid).

    The elementwise mean is ``dim`` scalar ``avg`` aggregates in ONE
    hash aggregate — JVM-side, map-side partial, one shuffle of
    (groups × dim) doubles — not a pandas UDF over collected vectors
    (which would shuffle every vector to its group's task). This is
    the label-centroid/query-class-vector builder of embedding
    pipelines; ``normalize=True`` L2-normalizes the mean (the usual
    form when the centroid is then used for cosine scoring).

    Rows with NULL vectors are excluded entirely (a NULL would
    otherwise skew per-dimension counts).
    """
    if dim is None:
        head = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if head is None:
            raise ValueError("centroids_by_group: cannot infer dim; pass dim=")
        dim = len(head[0])
    src = df.filter(F.col(vec_col).isNotNull())
    agg = src.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"_c{i}")
            for i in range(dim)
        ],
    )
    centroid = F.array(*[F.col(f"_c{i}") for i in range(dim)])
    if normalize:
        nrm = F.sqrt(
            F.aggregate(centroid, F.lit(0.0), lambda a, x: a + x * x)
        )
        centroid = F.transform(centroid, lambda x: x / nrm)
    return agg.select(group_col, "n", centroid.alias("centroid"))


#: above this many matrix cells the baked-literal plan text gets big
#: enough to threaten Janino's 64 KB codegen limits — fall back to
#: evaluating the hash per cell (same bits, dimension-independent)
_RP_BAKE_MAX_CELLS = 4096


def _rp_sign_py(i: int, j: int, d_out: int) -> int:
    """sign(i,j): the Lehmer double-round parity on the flattened
    index — same arithmetic as the sketch family's _hash31 (all
    values < 2^47: exact in any engine's int64)."""
    k = (i - 1) * d_out + j
    a = (k * 48271) % 2147483647
    b = ((a ^ (a >> 15)) * 69621) % 2147483647
    return 1 - 2 * ((b ^ (b >> 13)) % 2)


def _rp_sign_sql(d_out: int) -> str:
    """The same parity as a Spark SQL expression over lambda vars
    (i, j) — used when the matrix is too big to bake as literals."""
    k = f"(cast(i - 1 as bigint) * {d_out} + j)"
    a = f"(({k} * 48271) % 2147483647)"
    b = f"((({a} ^ shiftright({a}, 15)) * 69621) % 2147483647)"
    return f"cast(1 - 2 * (({b} ^ shiftright({b}, 13)) % 2) as double)"


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    d_in: int = 64,
    d_out: int = 16,
    bake: bool | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random sign projection (Achlioptas 2003:
    r_ij ∈ {±1} preserves pairwise distances like Gaussian R, database-
    friendly): y_j = Σ_i x_i·sign(i,j) / √d_out, appended as
    ``projected`` (array<double>, 6-dp). The dimensionality-reduction
    step in front of ANN/LSH at 100 TB: a 4× narrower vector shrinks
    every downstream shuffle, index, and distance kernel 4× while JL
    bounds the distance distortion (ε ≈ √(8·ln n / d_out)).

    sign(i,j) is the parity of the sketch family's Lehmer double-round
    hash on the flattened index — deterministic and engine-independent
    (the DuckDB oracle re-derives every sign FROM the hash). Up to
    ``_RP_BAKE_MAX_CELLS`` cells the matrix is baked into the plan as
    a d_out×d_in literal array of double signs (computed once here:
    the hot path becomes one multiply-add per cell — measured 6× at
    sf0.1, 2.88→0.48 s); past that the plan text would threaten
    Janino's 64 KB codegen limits (768×64 ≈ 49k literals), so the
    hash evaluates per cell instead — identical bits, dimension-
    independent plan size (equality of the two paths is unit-tested).
    ``bake`` forces a path; None picks by size. Pure whole-stage-
    codegen HOFs either way — no UDF, no shuffle, evaluated in the
    scan projection.

    Vectors shorter than ``d_in`` raise at run time (``raise_error``
    inside the projection): Spark's ``element_at`` past the end yields
    NULL and poisons the fold to NULL, while DuckDB's ``list_sum``
    skips NULLs and returns a partial sum — a silent cross-engine
    divergence (ADVICE r7). Malformed input fails loudly instead;
    callers that want to keep short vectors filter or pad first.
    """
    import math

    inv = 1.0 / math.sqrt(d_out)
    if bake is None:
        bake = d_in * d_out <= _RP_BAKE_MAX_CELLS
    if bake:
        rows = ", ".join(
            "array(" + ", ".join(
                f"{_rp_sign_py(i, j, d_out)}.0D" for i in range(1, d_in + 1)
            ) + ")"
            for j in range(1, d_out + 1)
        )
        sign = f"element_at(element_at(array({rows}), j), i)"
    else:
        sign = _rp_sign_sql(d_out)
    proj = f"""
    CASE WHEN {vec_col} IS NULL THEN NULL
    WHEN size({vec_col}) >= {d_in} THEN
      transform(sequence(1, {d_out}), j ->
        round(aggregate(sequence(1, {d_in}), cast(0 as double), (acc, i) ->
          acc + cast(element_at({vec_col}, i) as double) * {sign}
        ) * {inv!r}, 6))
    ELSE raise_error(concat(
      'random_projection: vector shorter than d_in={d_in} (got ',
      cast(size({vec_col}) as string), ')'))
    END
    """
    return df.withColumn("projected", F.expr(proj))


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
    anchor_vec_col: str = "anchor_vec",
    anchor_label_col: str = "anchor_label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (round 8): for
    each anchor, the ``k`` corpus vectors MOST similar to it that
    carry a DIFFERENT label — the near-miss negatives that make a
    contrastive loss learn boundaries instead of memorizing easy
    pairs (the in-batch-negatives upgrade every embedding-model
    pipeline ships).

    Scale shape: identical to :func:`cosine_topk_many` — broadcast
    the (small) anchor set, score each corpus row map-side, DROP
    same-label pairs before any aggregation (the filter is the whole
    semantic difference and costs one codegen comparison per scored
    pair), then the shared two-phase top-k reduction: shuffle volume
    is O(|anchors| · k · partitions), never the scored pairs. The
    anchor itself (same id) is also excluded, so an unlabeled anchor
    never returns itself.
    """
    corpus = ensure_parallelism(corpus)
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col(label_col) != F.col(anchor_label_col))
            & (F.col(id_col) != F.col(anchor_id_col))
        )
        .select(
            F.col(anchor_id_col),
            F.col(id_col),
            cosine(F.col(vec_col), F.col(anchor_vec_col)).alias("cosine"),
            F.spark_partition_id().alias("_pid"),
        )
    )
    return _topk_two_phase(scored, k, id_col, anchor_id_col)


def hard_negatives_lsh(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    bands: int = 16,
    planes_per_band: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
    anchor_vec_col: str = "anchor_vec",
    anchor_label_col: str = "anchor_label",
) -> DataFrame:
    """Hard-negative mining at ANCHOR scale (round 8): when every
    training sample is an anchor, :func:`hard_negatives`'s broadcast
    cross-score is O(n·|anchors|) — this variant bands BOTH sides
    with the same hyperplane signatures (the
    ``embedding_near_dup_pairs`` LSH machinery) and scores only
    same-bucket, different-label pairs: an equi-join on (band, key),
    never all pairs. Exact cosine on the candidates keeps precision 1;
    recall per true near-neighbor is 1-(1-(1-θ/π)^r)^bands — the
    closer (harder) the negative, the likelier it collides, which is
    exactly the bias a hard-negative miner wants.

    Parameter regime — DIFFERENT from near-dup LSH: hard negatives
    live at MODERATE cosine (θ ≈ 50-70°), where an 8-plane signature
    almost never fully agrees ((1-θ/π)^8 ≈ 2% per band — measured 0/6
    top-1 recall at 4×8 on the gate embeddings). Few planes + many
    bands is the working point: the 16×4 default gives per-band
    collision (1-θ/π)^4 ≈ 0.20 at θ=60° and ≈ 97% top-1 recall over
    16 bands, while still cutting the candidate set quadratically vs
    all-pairs on the label-mismatch side.

    Candidates are de-duplicated across bands BEFORE the cosine (one
    distinct on (anchor, id)), then reduced with the shared two-phase
    top-k — shuffle is candidates + |anchors|·k·partitions rows.
    """
    def banded(df: DataFrame, idc: str, vecc: str, labc: str, prefix: str) -> DataFrame:
        # ONE Arrow-batched matmul per side computes every band's sign
        # bucket (bit-identical to hyperplane_bucket's fold — the
        # lsh_table_buckets contract); the Column-fold alternative is
        # bands × planes aggregate folds PER ROW, measured 8.4 s vs
        # ~1 s on the gate (the same trap lsh_table_buckets documents)
        b = lsh_table_buckets(
            dim, n_planes=planes_per_band, n_tables=bands, seed=seed,
            vec_col=vecc,
        )
        return df.select(
            F.col(idc).alias(f"{prefix}id"),
            F.col(vecc).alias(f"{prefix}v"),
            F.col(labc).alias(f"{prefix}l"),
            F.posexplode(b).alias("band", "key"),
        )

    c = banded(corpus, id_col, vec_col, label_col, "_c")
    a = banded(anchors, anchor_id_col, anchor_vec_col, anchor_label_col, "_a")
    cand = (
        c.join(a, ["band", "key"])
        .filter((F.col("_cl") != F.col("_al")) & (F.col("_cid") != F.col("_aid")))
        .select("_aid", "_cid", "_av", "_cv")
        .distinct()
    )
    scored = cand.select(
        F.col("_aid").alias(anchor_id_col),
        F.col("_cid").alias(id_col),
        cosine(F.col("_cv"), F.col("_av")).alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    return _topk_two_phase(scored, k, id_col, anchor_id_col)


def margin_mine(
    corpus: DataFrame,
    pool: DataFrame,
    *,
    k: int = 4,
    threshold: float = 1.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool_id_col: str | None = None,
    max_pool: int = 200_000,
    max_pool_bytes: int = 256 << 20,
) -> DataFrame:
    """Margin-based nearest-neighbor mining (Artetxe & Schwenk 2019 —
    the CCMatrix/LASER bitext-mining criterion): pair each corpus
    vector x with its best pool vector y and keep the pair if the
    RATIO margin clears ``threshold``::

        margin(x, y) = cos(x, y) /
                       ((fwd_k(x) + bwd_k(y)) / 2)

    where ``fwd_k(x)`` is the mean cosine of x's k nearest pool
    vectors and ``bwd_k(y)`` the mean cosine of y's k nearest corpus
    vectors. Absolute-cosine thresholds over-fire on hubs (vectors
    close to everything); the margin normalizes by both sides' local
    neighborhood density, which is why the published pipelines mine
    with it.

    Scale shape (pool small — the "target language" / query side —
    corpus unbounded):
    - forward: pool collects to ONE normalized matrix (``max_pool``
      guard, as in decontam.semantic_decontam); every corpus batch
      computes its top-k + mean in a single Arrow matmul — NO shuffle.
    - backward: the same broadcast crossed the other way, reduced with
      the two-phase partial top-k (``_topk_two_phase``) — shuffle is
      O(|pool| · k · partitions), never the n·|pool| scored rows.
    - the final margin is one broadcast join of corpus rows to the
      |pool|-row backward-mean table.

    Determinism contract: similarities quantize to integer
    MICRO-COSINES (round(cos·10⁶), ties to the smaller id) before any
    selection, and both neighborhood means stay exact integer sums
    until one final double division — means of 6-decimal values land
    exactly ON .5e-6 rounding boundaries (where numpy's banker
    rounding and SQL's half-away rounding disagree), so the integer
    form is the only shape a brute-force SQL oracle replays
    bit-exactly. Returns
    ``(id_col, pool_id, cos, fwd_mean, bwd_mean, margin)`` for pairs
    with ``margin >= threshold``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from duo_spark.operators.util import collect_vector_matrix

    pid = pool_id_col or id_col
    # row cap AND byte cap (round-12 VERDICT #5: a row cap alone is
    # dimension-blind — 200k rows is 1.6 GB at dim=1024 float64)
    pool_ids, M = collect_vector_matrix(
        pool, pid, vec_col,
        max_rows=max_pool, max_bytes=max_pool_bytes, what="pool",
        row_knob="max_pool", byte_knob="max_pool_bytes",
    )
    pnorm = np.linalg.norm(M, axis=1, keepdims=True)
    # a zero-norm pool vector would cast its NaN micro-cosines to
    # INT64_MIN, whose negation overflows back to INT64_MIN and sorts
    # FIRST — the degenerate vector would become every row's top-1 and
    # the miner would emit garbage; fail loud instead
    bad = ~np.isfinite(pnorm.ravel()) | (pnorm.ravel() == 0)
    if bad.any():
        raise ValueError(
            f"pool rows with zero/NaN embeddings: "
            f"{pool_ids[bad][:5].tolist()}"
        )
    M = M / pnorm
    order = np.argsort(pool_ids, kind="stable")
    pool_ids, M = pool_ids[order], M[order]
    kk = min(k, len(pool_ids))

    def _fwd(v):  # per corpus row: best pool id, micro-cos, top-k sum
        mat = np.array(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm corpus rows score 0 everywhere (unmineable), never
        # NaN — NaN casts to INT64_MIN and corrupts the integer sums
        sims = (mat / np.where(norms == 0, 1.0, norms)) @ M.T
        # half-away-from-zero micro-quantization (matches SQL round;
        # raw matmul cosines never sit on exact .5e-6 boundaries)
        micro = np.where(
            sims >= 0,
            np.floor(sims * 1e6 + 0.5),
            -np.floor(-sims * 1e6 + 0.5),
        ).astype(np.int64)
        # ids ascend left-to-right, so a stable sort on (-micro)
        # keeps the smaller id first among ties
        idx = np.argsort(-micro, axis=1, kind="stable")[:, :kk]
        rows_ix = np.arange(len(mat))[:, None]
        top = micro[rows_ix, idx]
        return pd.DataFrame(
            {
                "pool_id": pool_ids[idx[:, 0]],
                "cos_u": top[:, 0],
                "fwd_sum": top.sum(axis=1),
            }
        )

    # asNondeterministic: same §4.4 duplication as _centroid_sims_udf —
    # the committed margin_mine plan evaluated _fwd (a per-row matmul
    # against the whole broadcast pool) TWICE around a pushed filter.
    fwd = pandas_udf(
        _fwd, "pool_id: long, cos_u: long, fwd_sum: long"
    ).asNondeterministic()(F.col(vec_col))
    forward = corpus.select(F.col(id_col), fwd.alias("_f")).select(
        id_col,
        F.col("_f.pool_id").alias("pool_id"),
        F.col("_f.cos_u").alias("_cos_u"),
        F.col("_f.fwd_sum").alias("_fwd_sum"),
    )
    # backward: micro-cosines through the shared two-phase top-k
    queries = pool.select(
        F.col(pid).alias("_qid"), F.col(vec_col).alias("_qv")
    )
    # zero-norm corpus rows score 0 here too (ANSI mode would throw on
    # the cosine's division otherwise); pool norms are guarded nonzero
    denom = _norm(F.col(vec_col)) * _norm(F.col("_qv"))
    safe_cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        _dotd(F.col(vec_col), F.col("_qv")) / denom
    )
    scored = ensure_parallelism(corpus).crossJoin(F.broadcast(queries)).select(
        F.col("_qid"),
        F.col(id_col),
        F.round(safe_cos * F.lit(1e6)).cast("long").alias("cosine"),
        F.spark_partition_id().alias("_pid"),
    )
    bwd = (
        _topk_two_phase(scored, k, id_col, "_qid")
        .groupBy("_qid")
        .agg(F.sum("cosine").alias("_bwd_sum"),
             F.count(F.lit(1)).alias("_bwd_n"))
        .withColumnRenamed("_qid", "pool_id")
    )
    joined = forward.join(F.broadcast(bwd), "pool_id")
    cos_d = F.col("_cos_u") / F.lit(1e6)
    fwd_mean = F.col("_fwd_sum") / F.lit(float(kk) * 1e6)
    bwd_mean = F.col("_bwd_sum") / (F.col("_bwd_n") * F.lit(1e6))
    # try_divide: with mutually orthogonal neighborhoods the micro-
    # quantized fwd/bwd top-k sums can both be exactly 0 (|cos| < 5e-7
    # rounds to 0), and positive/negative cosines can cancel — a plain
    # `/` would kill the job under ANSI mode. A NULL margin then fails
    # the >= threshold filter below, which is the right outcome: a
    # zero-mean neighborhood carries no margin signal (round-12 ADVICE)
    margin = F.round(F.try_divide(cos_d, (fwd_mean + bwd_mean) / 2), 6)
    return (
        joined.select(
            id_col,
            "pool_id",
            cos_d.alias("cos"),
            fwd_mean.alias("fwd_mean"),
            bwd_mean.alias("bwd_mean"),
            margin.alias("margin"),
        )
        .filter(F.col("margin") >= F.lit(threshold))
    )
