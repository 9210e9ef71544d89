"""Ingest normalization (SURVEY §1.4) — the transforms the reference
applies between the wire and the store, plus process registration.

Three pieces:

1. Span normalization (duo/src/models.rs:104-147):
   - ``busy``/``idle`` µs tag values are reformatted to human strings
     ("3us"/"3.00ms"/"3.00s", models.rs:106-112,186-195) at INGEST —
     stored tags carry the display form, not the raw number.
   - a missing ``end`` defaults to "now" (models.rs:135-141) when a
     ``now_us`` is supplied (conversion happens post-completion in the
     reference, so this only fires for force-flushed spans).

2. Log normalization (duo/src/models.rs:148-158):
   - ``message`` is popped out of the fields map into its own column
     (C6, models.rs:154-158).
   - proto level ints become level strings (C5, defaulting DEBUG for
     unknown values, models.rs:150-152).

3. Process registration (duo/src/memory.rs:103-124,141-148): each
   connection of a service gets id ``"{service}-{n}"`` (n = number of
   processes already registered for that service); the registry
   persists as one ``process.json`` through the store and reloads at
   startup (duo/src/memory.rs:60-79).

The DataFrame transforms are pure Column expressions (codegen, no
UDFs); registration is a driver-side control-plane operation on a tiny
registry, exactly like the reference's in-memory HashMap + JSON file.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duo_spark.functions.codec import level_from_int, message_from_fields
from duo_spark.functions.time import format_timing
from duo_spark.sources.store import PartitionedStore

#: tag keys whose numeric µs values get the human display form at
#: ingest (duo/src/models.rs:107)
TIMING_TAG_KEYS = ("busy", "idle")

PROCESS_JSON = "process.json"


def normalize_timing_tags(tags_json: Column | str) -> Column:
    """busy/idle µs values inside a JSON tags column -> "3us"/"3.00ms"
    strings (models.rs:106-112). Non-numeric values pass through; a
    NULL tags column stays NULL."""
    c = F.col(tags_json) if isinstance(tags_json, str) else tags_json
    m = F.from_json(c, "map<string,string>")
    fixed = F.transform_values(
        m,
        lambda k, v: F.when(
            k.isin(*TIMING_TAG_KEYS) & v.rlike(r"^\d+$"),
            format_timing(v.cast("long")),
        ).otherwise(v),
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(F.to_json(fixed))


def normalize_spans(df: DataFrame, now_us: int | None = None) -> DataFrame:
    """Wire-shape span records -> store shape: timing tags humanized;
    optionally default a missing ``end`` to ``now_us``
    (models.rs:135-141 — null end never persists)."""
    out = df.withColumn("tags", normalize_timing_tags("tags"))
    if now_us is not None:
        out = out.withColumn("end", F.coalesce(F.col("end"), F.lit(now_us).cast("long")))
    return out


def normalize_logs(df: DataFrame, fields_col: str = "fields", level_is_int: bool = False) -> DataFrame:
    """Wire-shape log records -> store shape.

    - ``message`` extracted from the fields map (C6); an existing
      message column wins (the map copy is dropped either way).
    - remaining fields stay in ``fields_col`` for schema promotion
      (see sources.logschema).
    - proto int levels -> strings, unknown -> DEBUG
      (models.rs:150-152) when ``level_is_int``.
    """
    out = df
    if fields_col in df.columns:
        message, rest = message_from_fields(fields_col)
        if "message" in df.columns:
            message = F.coalesce(F.col("message"), message)
        out = out.withColumn("message", message).withColumn(fields_col, rest)
    if level_is_int:
        out = out.withColumn(
            "level", F.coalesce(level_from_int("level"), F.lit("DEBUG"))
        )
    return out


class ProcessRegistry:
    """The service -> processes registry (duo/src/memory.rs:14-15,
    103-124): tiny, driver-held, persisted as process.json."""

    def __init__(self, store: PartitionedStore | None = None):
        self.store = store
        self._services: dict[str, list[dict[str, Any]]] = {}
        if store is not None:
            data = store.read_json(PROCESS_JSON)
            if isinstance(data, list):
                for p in data:
                    self._services.setdefault(p["service_name"], []).append(p)

    def register_process(self, service: str, tags: dict[str, Any] | None = None) -> str:
        """New process id "{service}-{n}" (memory.rs:112); persists the
        registry through the store (memory.rs:122,141-148)."""
        procs = self._services.setdefault(service, [])
        pid = f"{service}-{len(procs)}"
        procs.append({"id": pid, "service_name": service, "tags": tags or {}})
        if self.store is not None:
            self.store.write_json(PROCESS_JSON, self.process_list())
        return pid

    def process_list(self) -> list[dict[str, Any]]:
        return [p for procs in self._services.values() for p in procs]

    def processes(self) -> dict[str, dict[str, Any]]:
        """pid -> Process (memory.rs:90-100) — the shape
        web.api.QueryService consumes."""
        return {p["id"]: p for p in self.process_list()}

    def service_names(self) -> list[str]:
        return sorted(self._services)
