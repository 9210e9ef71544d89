"""Fluent query builder — the engine's equivalent of duo's ``Query``
struct (duo/src/query.rs:56-135).

The reference accumulates (range, sort, limit/skip, filters) into a
builder, assembles a DataFusion DataFrame (hot MemTable ∪ cold parquet),
then collects. Here the builder accumulates the same state and emits ONE
lazy DataFrame; Catalyst sees the whole pipeline (scan ∪ scan → filter →
sort → offset/limit) and plans it globally — filters push into both
union branches and down to the parquet scan, sort+limit plan as
TakeOrderedAndProject (top-k, no full sort at scale).

Deviations from the reference (documented, intentional):
- AggregateQuery in the reference applies ``limit`` BEFORE the aggregate
  (duo/src/query.rs:139-151) — capping *input rows scanned*, an artifact
  of building limit into df() unconditionally. We apply limit AFTER
  sort, which is the semantics its HTTP API documents (top-N buckets).
- Sort-then-limit is always given a total order (caller supplies
  tiebreakers) so pagination is deterministic; the reference's trace
  truncation is HashMap-order nondeterministic (services.rs:78-81).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default lookback when no start time is given — duo/src/query.rs:106-109
DEFAULT_LOOKBACK_US = 15 * 60 * 1_000_000


@dataclass
class Query:
    """Compose filters/range/sort/pagination over a base DataFrame."""

    df_base: DataFrame
    time_col: str = "time"
    _filters: list[Column] = field(default_factory=list)
    _range: tuple[int | None, int | None] | None = None
    _sort: list[Column] = field(default_factory=list)
    _skip: int = 0
    _fetch: int | None = None

    def filter(self, *preds: Column) -> "Query":
        self._filters.extend(preds)
        return self

    def range(self, start_us: int | None, end_us: int | None) -> "Query":
        """F7 — time-range gate in µs (None start => 15-min lookback
        from end, matching duo/src/query.rs:104-111)."""
        self._range = (start_us, end_us)
        return self

    def sort(self, *cols: Column) -> "Query":
        self._sort = list(cols)
        return self

    def limit(self, skip: int, fetch: int | None) -> "Query":
        self._skip = skip
        self._fetch = fetch
        return self

    def df(self) -> DataFrame:
        """Assemble the lazy plan (duo/src/query.rs:99-113 equivalent)."""
        out = self.df_base
        if self._range is not None:
            start, end = self._range
            if start is None and end is not None:
                start = end - DEFAULT_LOOKBACK_US
            c = F.col(self.time_col)
            if start is not None:
                out = out.filter(c >= F.lit(start))
            if end is not None:
                out = out.filter(c <= F.lit(end))
        for p in self._filters:
            out = out.filter(p)
        if self._sort:
            out = out.orderBy(*self._sort)
        if self._skip:
            out = out.offset(self._skip)
        if self._fetch is not None:
            out = out.limit(self._fetch)
        return out
