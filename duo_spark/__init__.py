"""duo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of duo-rs/duo (a log/trace observability
backend built on Arrow + Parquet + DataFusion).

Architecture (Spark-first, NOT a port):

- ``schemas``     — typed StructTypes for the span/log/process tables
                    (reference: duo/src/schema.rs:16-42).
- ``functions``   — scalar codecs: µs timestamps, duration parse/format,
                    level enum, tags JSON (reference: duo/src/models.rs,
                    duo/src/web/deser.rs).
- ``plans``       — the fluent query builder (filter/range/sort/limit)
                    mirroring duo/src/query.rs, expressed as lazy
                    DataFrame transforms so Catalyst optimizes the whole
                    pipeline.
- ``operators``   — log search, field stats, trace assembly, span merge,
                    plus the large-scale-pipeline extensions (dedup,
                    similarity search, text analysis, multimodal).
- ``sources``     — partitioned Parquet storage (date=/hour=/minute=
                    layout, bloom filters on trace_id), hot/cold union,
                    time-prefix pruning (duo/src/partition/, duo/src/utils.rs).
- ``streaming``   — Structured Streaming ingest: span-completion state,
                    micro-batch flush (duo/src/grpc/server.rs timers,
                    duo/src/aggregator.rs).
- ``api``         — Jaeger/logs JSON result shaping (duo/src/web/serialize.rs).
"""

__version__ = "0.1.0"
