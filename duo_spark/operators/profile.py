"""Table profiling (ANALYZE-style column statistics).

Pipeline QA needs per-column health stats — null rates, cardinality,
value ranges — before and after every curation stage; the reference
has no equivalent (its `/stats` endpoint is a stub,
`duo/src/web/mod.rs:94-102`). One wide aggregate computes every
column's stats in a single pass over the data: Spark rewrites the
multi-distinct aggregate with an Expand (one stream per distinct
column) but still one scan, map-side partial aggregation, and one
shuffle of tiny partial states — at 100 TB the cost is the scan, as
it should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form column profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    ``n_distinct`` is EXACT (count_distinct — nulls excluded, SQL
    semantics); min/max are rendered as strings so mixed column types
    share one output schema (numeric columns keep numeric ordering —
    the cast to string happens after the aggregate).
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls{i}"),
            F.count_distinct(F.col(c)).alias(f"_nd{i}"),
            F.min(c).cast("string").alias(f"_min{i}"),
            F.max(c).cast("string").alias(f"_max{i}"),
        ]
    wide = df.agg(*aggs)
    # k is the column count: unpivot the single wide row with a stack
    parts = ", ".join(
        f"'{c}', _n, _nulls{i}, _nd{i}, _min{i}, _max{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) as "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
