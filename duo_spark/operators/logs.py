"""Log query operators — the `/api/logs` family (SURVEY §3.1, §3.3).

Reference lifecycle: duo/src/web/logs.rs:101-115 (search) and 64-98
(field stats). Both are: predicate build -> hot∪cold scan -> filter ->
sort -> paginate. Here each is a single lazy DataFrame transform.

Scale notes:
- search is time-descending top-k: Catalyst plans orderBy+limit as
  TakeOrderedAndProject — per-partition heap + driver merge of k rows,
  no global sort even at 100 TB.
- field_stats is groupBy+count+top-20: partial (map-side) aggregation
  runs before the shuffle, so shuffle volume is O(distinct values), not
  O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duo_spark.plans.expr import service_predicate, user_predicate
from duo_spark.plans.query import Query

DEFAULT_LOG_LIMIT = 50  # duo/src/web/logs.rs:20
DEFAULT_STATS_LIMIT = 20  # duo/src/web/logs.rs:85


def search_logs(
    logs: DataFrame,
    service: str | None = None,
    expr: str | None = None,
    start_us: int | None = None,
    end_us: int | None = None,
    skip: int = 0,
    limit: int = DEFAULT_LOG_LIMIT,
    time_col: str = "time",
    tiebreaker: str | None = None,
) -> DataFrame:
    """`GET /api/logs` — duo/src/web/logs.rs:101-115.

    Sort is `time DESC` (desc_nulls_last, matching DataFusion's
    sort(false,false) at duo/src/query.rs:115-117); ``tiebreaker``
    (e.g. a unique id column) makes pagination deterministic.
    """
    q = Query(logs, time_col=time_col)
    if service:
        q = q.filter(service_predicate(service))
    if expr:
        q = q.filter(user_predicate(logs, expr))
    if start_us is not None or end_us is not None:
        q = q.range(start_us, end_us)
    sort_cols = [F.col(time_col).desc_nulls_last()]
    if tiebreaker:
        sort_cols.append(F.col(tiebreaker).desc_nulls_last())
    return q.sort(*sort_cols).limit(skip, limit).df()


def field_stats(
    logs: DataFrame,
    fld: str,
    service: str | None = None,
    expr: str | None = None,
    start_us: int | None = None,
    end_us: int | None = None,
    skip: int = 0,
    limit: int = DEFAULT_STATS_LIMIT,
    time_col: str = "time",
) -> DataFrame:
    """`GET /api/logs/stats/:field` — duo/src/web/logs.rs:64-98.

    GROUP BY field -> count -> count DESC -> top-20; null group values
    dropped (the reference drops them Rust-side at logs.rs:93-96; we
    filter pre-aggregation — same result, less shuffle). A secondary
    sort on `value` makes ties deterministic.

    KeyError if ``fld`` is not in the schema (reference 404s,
    logs.rs:69).
    """
    if fld not in logs.columns:
        raise KeyError(f"field {fld!r} not in log schema")
    q = Query(logs, time_col=time_col)
    if service:
        q = q.filter(service_predicate(service))
    if expr:
        q = q.filter(user_predicate(logs, expr))
    if start_us is not None or end_us is not None:
        q = q.range(start_us, end_us)
    base = q.df().filter(F.col(fld).isNotNull())
    return (
        base.groupBy(F.col(fld).alias("value"))
        .agg(F.count(fld).alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc())
        .offset(skip)
        .limit(limit)
    )


def field_stats_ref_quirk(
    logs: DataFrame,
    fld: str,
    scan_order: list,
    input_skip: int = 0,
    input_limit: int = DEFAULT_STATS_LIMIT,
) -> DataFrame:
    """The reference's LITERAL field-stats semantics
    (duo/src/query.rs:139-151 + duo/src/web/logs.rs:64-98): in
    ``AggregateQuery::collect`` the ``limit(skip, limit)`` lives
    inside ``RawQuery::df()`` and therefore caps the INPUT ROWS
    SCANNED before the aggregate runs; the count-desc sort applies
    after aggregation to however many groups the capped input
    produced, and null-value rows drop from the result Rust-side
    (logs.rs:93-96 — equivalent to filtering nulls after the cap,
    since ``count(col)`` never counts them).

    :func:`field_stats` deliberately deviates (DEVIATIONS #2: sort +
    limit push AFTER the aggregate — the semantics the UI wants).
    This formulation pins the reference's quirk so BOTH behaviors are
    regression-gated (VERDICT r13 #8). The reference's input order is
    its scan order (memtable insertion then parquet file order) —
    unreproducible in any distributed engine (same class as
    DEVIATIONS #1's hash order), so ``scan_order`` supplies the
    deterministic stand-in; the cap itself stays a bounded
    TakeOrderedAndProject, never a global collect.
    """
    if fld not in logs.columns:
        raise KeyError(f"field {fld!r} not in log schema")
    capped = logs.orderBy(*scan_order)
    if input_skip:
        capped = capped.offset(input_skip)
    capped = capped.limit(input_limit)
    return (
        capped.filter(F.col(fld).isNotNull())
        .groupBy(F.col(fld).alias("value"))
        .agg(F.count(fld).alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc())
    )
