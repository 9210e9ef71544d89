"""API-edge result shaping (SURVEY §3.1-§3.3): Jaeger trace JSON and
logs JSON, matching duo's HTTP contract."""

from duo_spark.web.serialize import (
    jaeger_data,
    serialize_log,
    serialize_process,
    serialize_span,
    serialize_trace,
    traces_to_jaeger,
)

__all__ = [
    "jaeger_data",
    "serialize_log",
    "serialize_process",
    "serialize_span",
    "serialize_trace",
    "traces_to_jaeger",
]
