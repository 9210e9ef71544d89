"""Time codecs (SURVEY §2.8 C1-C3).

- C1 µs timestamp codec: i64 µs <-> timestamp
  (reference duo/src/models.rs:61-67, duo/src/web/deser.rs:44-63).
- C2 duration parse: "100us"/"100ms"/"1s" -> µs
  (reference duo/src/web/deser.rs:241-252).
- C3 timing format: µs int -> "3us"/"3.00ms"/"3.00s"
  (reference duo/src/models.rs:186-195; unit table at 197-214).

All are pure Column expressions (whole-stage-codegen friendly). C2 also
has a plain-Python twin for driver-side parameter parsing.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def timestamp_from_us(col: Column | str) -> Column:
    """Int64 µs since epoch -> TimestampType (C1, read direction)."""
    return F.timestamp_micros(F.col(col) if isinstance(col, str) else col)


def us_from_timestamp(col: Column | str) -> Column:
    """TimestampType -> Int64 µs since epoch (C1, write direction)."""
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(us|µs|ms|s)\s*$")
_UNIT_US = {"us": 1, "µs": 1, "ms": 1_000, "s": 1_000_000}


def parse_duration_us(text: str) -> int | None:
    """Driver-side duration literal parse: "100us"/"100ms"/"1s" -> µs.

    Mirrors duo/src/web/deser.rs:241-252 (used for minDuration /
    maxDuration HTTP params — these arrive as scalars, so a Python
    helper is the right altitude; no per-row work).
    """
    m = _DURATION_RE.match(text)
    if not m:
        return None
    # round, don't truncate: "32.66ms" * 1000 is 32659.999... in
    # binary, and flooring would lose a µs the decimal literal names
    # exactly (the reference parses integers only, so decimal
    # semantics are ours to define; the Column twin keeps Spark's
    # truncating cast, mirrored by its oracle)
    return round(float(m.group(1)) * _UNIT_US[m.group(2)])


def parse_duration_us_col(col: Column | str) -> Column:
    """Column form of C2 for per-row duration strings."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, r"^(\d+(?:\.\d+)?)", 1).cast("double")
    unit = F.regexp_extract(c, r"(us|µs|ms|s)\s*$", 1)
    factor = (
        F.when(unit == "ms", F.lit(1_000.0))
        .when(unit == "s", F.lit(1_000_000.0))
        .when((unit == "us") | (unit == "µs"), F.lit(1.0))
        .otherwise(F.lit(None))
    )
    return (num * factor).cast("long")


def format_timing_py(us: int) -> str:
    """Driver-side twin of :func:`format_timing` (same unit table,
    duo/src/models.rs:186-195) for ingest-bridge normalization where
    no SparkSession is in play."""
    if us < 1_000:
        return f"{us}us"
    if us < 1_000_000:
        return f"{us / 1_000.0:.2f}ms"
    return f"{us / 1_000_000.0:.2f}s"


def format_timing(col: Column | str) -> Column:
    """µs int -> human duration string (C3).

    Semantics from duo/src/models.rs:186-195:
      < 1ms   -> "{n}us"        (integer µs)
      < 1s    -> "{x:.2f}ms"
      else    -> "{x:.2f}s"
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < 1_000, F.concat(c.cast("string"), F.lit("us")))
        .when(c < 1_000_000, F.format_string("%.2fms", c / 1_000.0))
        .otherwise(F.format_string("%.2fs", c / 1_000_000.0))
    )
