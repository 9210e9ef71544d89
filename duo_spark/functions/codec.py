"""Value codecs (SURVEY §2.8 C4-C6).

- C4 tags JSON codec: map <-> JSON string
  (reference duo/src/arrow.rs:33 stores span tags as one JSON string
  column; duo/src/web/deser.rs:22-27 reads it back).
- C5 level enum codec: proto int <-> "ERROR".."TRACE"
  (reference duo-api/src/common.rs:39-60).
- C6 message extraction: pop the "message" key out of a fields map
  (reference duo/src/models.rs:154-158).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duo_spark.schemas import LEVELS

_TAGS_MAP_TYPE = T.MapType(T.StringType(), T.StringType())


def tags_to_json(col: Column | str) -> Column:
    """Map column -> JSON string (storage form of span tags, C4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)


def tags_from_json(col: Column | str) -> Column:
    """JSON string -> map<string,string> (query form of span tags, C4).

    The reference stores heterogenous JSON values; string-ifying them is
    lossless for the engine's own uses (tag display, error=true flag).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, _TAGS_MAP_TYPE)


def tags_variant(col: Column | str) -> Column:
    """JSON string -> map<string,variant> (merge form of span tags).

    The reference's aggregator folds tag maps KEEPING each value's
    JSON kind (aggregator.rs:17-30; serialize.rs:40-68 then maps
    bool->bool, number->int64) — a map<string,string> fold would
    stringify ``error: true`` into ``"true"`` and break the typed
    Jaeger tag output (found by the round-8 fast-pipeline flip).
    Spark 4's VariantType carries the kinds through map_zip_with and
    back out via to_json."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, "map<string,variant>")


def level_from_int(col: Column | str) -> Column:
    """Proto level int (1..5) -> "ERROR".."TRACE" string (C5).

    try_element_at (1-based, matching the proto enum numbering) yields
    NULL for out-of-range ints — the reference's fallible conversion
    (duo-api/src/common.rs:39-60) — instead of an ANSI-mode exception.
    Index 0 (proto's "unspecified") is special-cased to NULL:
    try_element_at treats 0 as INVALID_INDEX_OF_ZERO, not out-of-range.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_element_at(
        F.array(*[F.lit(lv) for lv in LEVELS]), F.nullif(c.cast("int"), F.lit(0))
    )


def level_to_int(col: Column | str) -> Column:
    """Level string -> proto int (C5, reverse)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("int")
    for i, lv in enumerate(LEVELS, start=1):
        expr = F.when(c == lv, F.lit(i)).otherwise(expr)
    return expr


def message_from_fields(fields_col: Column | str) -> tuple[Column, Column]:
    """Split a fields map into (message, remaining_fields) (C6)."""
    c = F.col(fields_col) if isinstance(fields_col, str) else fields_col
    # try_element_at: a fields map without "message" yields NULL, not an
    # ANSI-mode INVALID_ARRAY_INDEX-style exception
    message = F.try_element_at(c, F.lit("message"))
    rest = F.map_filter(c, lambda k, _v: k != F.lit("message"))
    return message, rest
