"""User predicate construction (SURVEY §2.2 F1, F4-F6).

Reference: duo/src/web/logs.rs:42-60 —
  base predicate: process_id LIKE '{service}%'
  + optional user SQL expression parsed against the log schema (F4),
  falling back to `message ILIKE '%kw%'` when the parse fails (F5),
  AND-ed together (F6).

In Spark the user expression goes through ``F.expr`` (the full Spark SQL
expression parser — same capability class as DataFusion's
parse_sql_expr). Parse/ana­lysis failure is detected eagerly against the
target DataFrame so the fallback triggers exactly when the reference's
would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def service_predicate(service: str) -> Column:
    """F1 — service prefix match on process_id.

    The reference uses `LIKE '{service}%'` (duo/src/web/services.rs:22).
    ``startswith`` has identical semantics here (no wildcards inside a
    service name) and lets parquet scans prune via the pushed
    StringStartsWith filter.
    """
    return F.col("process_id").startswith(service)


def user_predicate(df: DataFrame, expr: str) -> Column:
    """F4/F5 — parse ``expr`` as SQL against ``df``'s schema; on failure
    treat it as a keyword and match `message ILIKE '%expr%'`.
    """
    try:
        col = F.expr(expr)
        # force analysis now so bad expressions fall back, mirroring
        # the reference's parse_sql_expr error path (logs.rs:54)
        df.select(col).schema  # noqa: B018 — analysis side effect
        return col
    except Exception:
        return F.col("message").ilike(f"%{_escape_like(expr)}%")


def _escape_like(kw: str) -> str:
    return kw.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
