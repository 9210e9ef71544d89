"""Dynamic log schema (SURVEY §1.1.2) — infer, merge, persist, reload.

Reference behavior: each ingest batch infers a schema for the user's
extra key-value fields (duo/src/arrow.rs:82-87), merges it into the
global log schema with ``Schema::try_merge``
(duo/src/schema.rs:78-89), persists the merged schema to
``schema/log_schema.json`` (duo/src/schema.rs:91-101) and reloads it
at startup (duo/src/schema.rs:48-72); the merged schema backs the
``/api/logs/schema`` endpoint (duo/src/web/logs.rs:37-39).

Spark mapping: a batch's schema IS its DataFrame schema (inference
already happened at createDataFrame/read.json). This registry owns the
cross-batch MERGE: new fields append in first-seen order; same-name
fields must agree or widen. Persisted form is the StructType JSON
(lossless round-trip via ``StructType.fromJson``) written through the
store's side-file API (K3), so it works on any object store.

Deviation (documented): ``Schema::try_merge`` PANICS on a type
conflict (SURVEY §7.4 calls this out); we widen instead — numeric
types widen along Spark's precedence list, anything irreconcilable
falls back to string (lossless, queryable). ``conform()`` casts a
batch to the merged schema before writing, so parquet files never
carry conflicting types for one column — which would otherwise break
``mergeSchema`` reads ("Failed to merge fields").
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duo_spark.schemas import LOG_CORE_SCHEMA
from duo_spark.sources.store import PartitionedStore

SCHEMA_JSON = "schema/log_schema.json"

#: numeric widening order (Spark's type-precedence tail for numerics)
_NUMERIC_ORDER = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(),
]


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Smallest common type for a cross-batch field conflict."""
    if a == b:
        return a
    if a in _NUMERIC_ORDER and b in _NUMERIC_ORDER:
        return max((a, b), key=_NUMERIC_ORDER.index)
    # decimal/date/bool/nested vs anything else: string is the lossless
    # common denominator the engine can still filter and aggregate on
    return T.StringType()


def merge_schemas(base: T.StructType, batch: T.StructType) -> T.StructType:
    """try_merge with widening: base field order preserved, new batch
    fields appended in batch order, all fields nullable (a field absent
    from any one batch is null there)."""
    out = {f.name: f.dataType for f in base.fields}
    order = [f.name for f in base.fields]
    for f in batch.fields:
        if f.name in out:
            out[f.name] = widen(out[f.name], f.dataType)
        else:
            out[f.name] = f.dataType
            order.append(f.name)
    return T.StructType([T.StructField(n, out[n], True) for n in order])


@dataclass
class LogSchemaRegistry:
    """The persistent merged log schema (duo/src/schema.rs:44-101)."""

    store: PartitionedStore
    rel_path: str = SCHEMA_JSON
    schema: T.StructType = field(init=False)

    def __post_init__(self) -> None:
        persisted = self.store.read_json(self.rel_path)
        if persisted is not None:
            self.schema = T.StructType.fromJson(persisted)
        else:
            self.schema = T.StructType(list(LOG_CORE_SCHEMA.fields))

    def merge_batch(self, df: DataFrame, table: str | None = None) -> T.StructType:
        """Merge a batch's schema in and persist (schema.rs:83-89 +
        91-101: persist-on-change).

        If the merge WIDENS an existing field's type (rather than just
        appending new fields) and ``table`` is given, the stored table
        is rewritten to the widened type — parquet's mergeSchema can
        union different column SETS but not conflicting column TYPES,
        so files written under the old type would poison every later
        read. Widening fires at most once per (field, type) ever, so
        the rewrite is a rare maintenance event, not a hot-path cost.
        """
        merged = merge_schemas(self.schema, df.schema)
        if merged == self.schema:
            return merged
        old = {f.name: f.dataType for f in self.schema.fields}
        widened = [
            f.name for f in merged.fields if f.name in old and old[f.name] != f.dataType
        ]
        self.schema = merged
        self.store.write_json(self.rel_path, json.loads(merged.json()))
        if widened and table is not None and self.store.exists(table):
            casts = {n: merged[n].dataType for n in widened}

            def _conform_types(stored: DataFrame) -> DataFrame:
                out = stored
                for name, dtype in casts.items():
                    if name in stored.columns:
                        out = out.withColumn(name, F.col(name).cast(dtype))
                return out

            self.store.rewrite(table, _conform_types)
        return merged

    def conform(self, df: DataFrame) -> DataFrame:
        """Project a batch onto the merged schema: missing fields null,
        widened fields cast — every parquet file the store writes is
        then merge-compatible with every other."""
        cols = []
        have = {f.name: f.dataType for f in df.schema.fields}
        for f in self.schema.fields:
            if f.name in have:
                c = F.col(f.name)
                if have[f.name] != f.dataType:
                    c = c.cast(f.dataType)
                cols.append(c.alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    def log_schema(self) -> list[dict[str, object]]:
        """The /api/logs/schema payload (duo/src/web/logs.rs:37-39)."""
        return [
            {"name": f.name, "data_type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in self.schema.fields
        ]


def ingest_log_batch(
    registry: LogSchemaRegistry,
    df: DataFrame,
    table: str = "log",
    time_col: str = "time",
) -> None:
    """One drifting ingest step: merge the batch schema (rewriting the
    table if a type widened), conform the batch, write through the
    store (the arrow.rs:82-92 path)."""
    registry.merge_batch(df, table=table)
    registry.store.write(registry.conform(df), table, time_col=time_col)
