"""Continuously-maintained rollup table (incremental view
maintenance): a streaming materialized GROUP BY backed by parquet.

Structured Streaming's complete-mode aggregations only reach memory/
console sinks, and append-mode parquet can't update a group's row —
so a continuously-updated rollup TABLE needs the foreachBatch
merge pattern: each micro-batch computes its partial aggregate and
merges it into the previous table version with a full-outer
coalesce-combine. Only decomposable aggregates (count/sum/min/max)
are supported — exactly the ones whose partials merge associatively,
so merging per batch equals aggregating the whole stream at once
(pinned against the batch GROUP BY in tests and the oracle gate).

Versioning gives replay idempotency for free, the same discipline as
streaming/dedup.py: batch ``b`` writes ``v=<b>`` and READS the newest
version strictly below ``b`` — a replayed batch (crash after the
write, before the checkpoint commit) re-merges into its true
predecessor instead of double-counting its own output. Old versions
are pruned after the write (keeping the predecessor), so steady state
holds two versions on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported decomposable aggregates and their merge functions.
#: sum must preserve NULL-ness: an all-NULL input column aggregates to
#: NULL in the one-shot batch GROUP BY, so merging two NULL partials
#: must stay NULL (a plain coalesce-to-0 merge would make the result
#: depend on the batch schedule). least/greatest skip NULLs natively;
#: count partials are never NULL.
_MERGES = {
    "sum": lambda a, b: F.when(
        a.isNull() & b.isNull(), F.lit(None)
    ).otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": F.least,
    "max": F.greatest,
}


def streaming_rollup(
    stream: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    out_dir: str,
    checkpoint_dir: str,
):
    """Maintain ``out_dir`` as the rolling GROUP BY of the stream.

    ``aggs`` maps output column -> (agg, input column), agg in
    {count, sum, min, max} (count ignores its input column). Read the
    current table with :func:`read_rollup`. Returns the started query
    (availableNow; caller awaits).
    """
    bad = [k for k, (a, _c) in aggs.items() if a not in _MERGES]
    if bad or not aggs:
        raise ValueError(f"unsupported/empty aggs: {bad or aggs}")

    def agg_expr(name: str) -> F.Column:
        a, c = aggs[name]
        if a == "count":
            return F.count(F.lit(1)).cast("long").alias(name)
        return getattr(F, a)(F.col(c)).alias(name)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partial = batch.groupBy(*group_cols).agg(
            *[agg_expr(n) for n in aggs]
        )
        prev_id = _latest_id(spark, out_dir, below=batch_id)
        prev = (
            None
            if prev_id is None
            else spark.read.schema(partial.schema).parquet(f"{out_dir}/v={prev_id}")
        )
        if prev is None:
            merged = partial
        else:
            p = prev.select(
                *[F.col(c).alias(f"_p_{c}") for c in prev.columns]
            )
            cond = [partial[c].eqNullSafe(p[f"_p_{c}"]) for c in group_cols]
            joined = partial.join(p, cond, "full_outer")
            merged = joined.select(
                *[
                    F.coalesce(partial[c], p[f"_p_{c}"]).alias(c)
                    for c in group_cols
                ],
                *[
                    _MERGES[aggs[n][0]](p[f"_p_{n}"], partial[n]).alias(n)
                    for n in aggs
                ],
            )
        merged.write.mode("overwrite").parquet(f"{out_dir}/v={batch_id}")
        keep = (batch_id,) if prev_id is None else (batch_id, prev_id)
        _prune_versions(spark, out_dir, keep=keep)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _version_ids(spark, out_dir: str) -> list[int]:
    fs, root = _fs(spark, out_dir)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                ids.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(ids)

def _latest_id(spark, out_dir: str, below: int | None = None) -> int | None:
    ids = _version_ids(spark, out_dir)
    if below is not None:
        ids = [i for i in ids if i < below]
    return ids[-1] if ids else None


def _prune_versions(spark, out_dir: str, keep: tuple[int, ...]) -> None:
    fs, _root = _fs(spark, out_dir)
    for vid in _version_ids(spark, out_dir):
        if vid not in keep:
            fs.delete(_fs(spark, f"{out_dir}/v={vid}")[1], True)


def read_rollup(spark, out_dir: str) -> DataFrame:
    """The current rollup table (newest version)."""
    vid = _latest_id(spark, out_dir)
    if vid is None:
        raise FileNotFoundError(f"no rollup versions under {out_dir}")
    return spark.read.parquet(f"{out_dir}/v={vid}")
