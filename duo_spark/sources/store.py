"""Partitioned Parquet storage + hot/cold union (SURVEY §2.1 S1/S2/S4,
K1, U1; §4 hot/cold).

Reference layout (duo/src/partition/writer.rs:18-63):
  {root}/{table}/date=YYYY-MM-DD/hour=HH/minute=MM/{file}.parquet
with a parquet bloom filter on trace_id (writer.rs:44-49).

Spark mapping:
- K1 writer  -> df.write.partitionBy("date","hour","minute") with
  `parquet.bloom.filter.enabled#trace_id=true` — identical on-disk
  contract, but distributed.
- S2/S3 scan -> spark.read.parquet(table_root); filters on the
  partition columns prune directories in the Catalyst optimizer (no
  manual prefix math), and predicate pushdown + row-group stats +
  bloom filters prune within files (S4).
- U1 hot∪cold -> unionByName(allowMissingColumns=True): the log schema
  drifts over time (new user fields), so positional union would be
  wrong; ByName fills missing columns with null, matching the
  reference's Schema::try_merge read behavior.

Scale notes: minute-grained dirs are right for the reference's 60 s
flush cadence, but at 100 TB/day minute dirs => ~1440*24 tiny dirs/day
and small-file pressure. The writer therefore takes a granularity knob
(minute | hour | date) and coalesces to a bounded file count per
partition. Compaction can rewrite minute dirs into hour files without
changing the read path (same partition columns).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duo_spark.functions.time import timestamp_from_us

PARTITION_COLS = ("date", "hour", "minute")


def with_partition_cols(df: DataFrame, time_col: str, granularity: str = "minute") -> DataFrame:
    """Derive date/hour/minute partition columns from a µs-epoch column."""
    ts = timestamp_from_us(time_col)
    out = df.withColumn("date", F.date_format(ts, "yyyy-MM-dd"))
    if granularity in ("hour", "minute"):
        out = out.withColumn("hour", F.date_format(ts, "HH"))
    if granularity == "minute":
        out = out.withColumn("minute", F.date_format(ts, "mm"))
    return out


@dataclass
class PartitionedStore:
    """Reader/writer for one storage root holding span/log tables."""

    spark: SparkSession
    root: str
    granularity: str = "minute"

    def table_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str, time_col: str, mode: str = "append") -> None:
        """K1 — partitioned parquet sink with trace_id bloom filter."""
        cols = {"date": ["date"], "hour": ["date", "hour"], "minute": list(PARTITION_COLS)}[
            self.granularity
        ]
        out = with_partition_cols(df, time_col, self.granularity)
        writer = out.write.mode(mode).partitionBy(*cols)
        if "trace_id" in df.columns:
            writer = writer.option("parquet.bloom.filter.enabled#trace_id", "true")
        writer.parquet(self.table_path(table))

    def read(self, table: str) -> DataFrame:
        """S2 — partition-discovering scan with mergeSchema so drifted
        log schemas unify (reference Schema::try_merge,
        duo/src/schema.rs:78-89)."""
        return self.spark.read.option("mergeSchema", "true").parquet(self.table_path(table))

    def exists(self, table: str) -> bool:
        p = self.table_path(table)
        return os.path.isdir(p) and any(
            name.startswith("date=") or name.endswith(".parquet") for name in os.listdir(p)
        )

    # -- K3: tiny JSON side files (process registry, merged log schema) --

    def write_json(self, rel_path: str, payload: object) -> None:
        path = os.path.join(self.root, rel_path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f)

    def read_json(self, rel_path: str) -> object | None:
        path = os.path.join(self.root, rel_path)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


@dataclass
class HotColdTable:
    """Fresh in-memory rows ∪ persisted parquet (duo/src/query.rs:102-111).

    ``hot`` is whatever DataFrame represents not-yet-flushed data (a
    createDataFrame of recent batches, a memory-sink stream table, or
    None in cold-only mode); ``memory_only`` mirrors the reference's
    --memory-mode (T5), skipping the parquet branch entirely.
    """

    store: PartitionedStore
    table: str
    hot: DataFrame | None = None
    memory_only: bool = False

    def df(self) -> DataFrame:
        cold = None if self.memory_only or not self.store.exists(self.table) else self.store.read(self.table)
        if self.hot is not None and cold is not None:
            # U1 with schema drift: ByName + allowMissingColumns
            return self.hot.unionByName(
                cold.drop(*PARTITION_COLS), allowMissingColumns=True
            )
        if self.hot is not None:
            return self.hot
        if cold is not None:
            return cold.drop(*PARTITION_COLS)
        raise ValueError(f"table {self.table!r} has neither hot nor cold data")
