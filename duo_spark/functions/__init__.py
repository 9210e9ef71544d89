"""Scalar functions (SURVEY §2.8 C1-C6) — all JVM-side Column expressions,
no Python UDFs in the hot path."""

from duo_spark.functions.codec import (
    level_from_int,
    level_to_int,
    message_from_fields,
    tags_from_json,
    tags_to_json,
)
from duo_spark.functions.time import (
    format_timing,
    format_timing_py,
    parse_duration_us,
    timestamp_from_us,
    us_from_timestamp,
)

__all__ = [
    "format_timing",
    "format_timing_py",
    "level_from_int",
    "level_to_int",
    "message_from_fields",
    "parse_duration_us",
    "tags_from_json",
    "tags_to_json",
    "timestamp_from_us",
    "us_from_timestamp",
]
