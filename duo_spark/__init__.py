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


def _register_pickle_by_value() -> None:
    """Ship this package inside UDF closures instead of importing it on
    workers.

    Worker-side functions (``mapInPandas`` feature extraction,
    ``applyInPandasWithState`` span completion, pandas-UDF kernels) are
    pickled by pyspark's vendored cloudpickle. By default cloudpickle
    serializes them *by reference* (module + qualname), which makes every
    Python worker ``import duo_spark`` — that only works when the driver
    happens to run with an importable cwd/PYTHONPATH. A driver embedding
    this engine from anywhere else (the correctness gate runs from a
    foreign cwd) gets ``ModuleNotFoundError`` inside the worker.

    Registering every ``duo_spark`` submodule for by-value serialization
    makes the closures self-contained: the function bytecode and its
    package globals travel with the task, and workers never import the
    package. Third-party imports (pyspark/pandas/numpy) still pickle by
    reference — those exist on any worker image. On a real cluster this
    composes with (and is strictly more robust than) shipping a wheel
    via ``spark-submit --py-files``.
    """
    import importlib
    import pkgutil
    import sys

    from pyspark.cloudpickle import register_pickle_by_value

    for info in pkgutil.walk_packages(__path__, prefix=__name__ + "."):
        try:
            importlib.import_module(info.name)
        except Exception:  # noqa: BLE001 — optional deps must not break import
            continue
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == __name__ or name.startswith(__name__ + ".")):
            register_pickle_by_value(mod)


_register_pickle_by_value()
