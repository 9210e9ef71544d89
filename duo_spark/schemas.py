"""Typed schemas for the engine-native tables.

Reference data model (duo-rs/duo):

- span table: duo/src/schema.rs:16-27 — fixed schema.
- log table:  duo/src/schema.rs:30-42 — fixed core + dynamically merged
  user fields (duo/src/arrow.rs:82-87). In Spark we represent the core
  columns as a fixed StructType and let extra fields ride as real
  top-level columns via parquet ``mergeSchema`` + ``unionByName``
  (allowMissingColumns) — schema evolution is built in, no custom merge
  code needed.
- process registry: duo/src/models.rs:10-15 — tiny dimension, broadcast.

Ids: the reference uses u64 ids but only ever generates random u32
widened to u64 (duo-subscriber/src/subscriber.rs:103), so LongType is a
faithful carrier. Foreign u64 >= 2^63 would be reinterpreted
(two's-complement) and formatted back to unsigned at the API edge.

Timestamps are Int64 MICROSECONDS since epoch (duo/src/models.rs:61-63,
duo/src/arrow.rs:24), kept as LongType for fidelity; derive a
TimestampType column only when window/event-time ops need one.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Span table — duo/src/schema.rs:16-27
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),  # null => root span
        T.StructField("trace_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("process_id", T.StringType(), False),  # "{service}-{n}"
        T.StructField("start", T.LongType(), False),  # µs since epoch
        T.StructField("end", T.LongType(), True),  # µs; null only pre-completion
        T.StructField("tags", T.StringType(), True),  # JSON object string
    ]
)

#: Log table fixed core — duo/src/schema.rs:30-42. Extra user fields are
#: appended as real columns per batch (schema evolution).
LOG_CORE_SCHEMA = T.StructType(
    [
        T.StructField("process_id", T.StringType(), False),
        T.StructField("time", T.LongType(), False),  # µs since epoch
        T.StructField("trace_id", T.LongType(), True),
        T.StructField("span_id", T.LongType(), True),
        T.StructField("level", T.StringType(), False),  # ERROR..TRACE
        T.StructField("target", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("line", T.IntegerType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

#: Process registry — duo/src/models.rs:10-15
PROCESS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # "{service}-{seq}"
        T.StructField("service_name", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

#: Log levels, most to least severe — duo-api proto common.proto Level
LEVELS = ("ERROR", "WARN", "INFO", "DEBUG", "TRACE")
