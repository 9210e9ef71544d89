#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop sink (full execution, no driver
materialization cost). A warmup pass on sf0.001 JIT-warms the JVM so
the measured numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duo_spark.queries import QUERIES  # noqa: E402
from duo_spark.session import get_spark  # noqa: E402

#: headline set: one per operator family, scale-relevant
BENCH_QUERIES = [
    "logs_search",
    "logs_pagination",
    "field_stats_level",
    "field_stats_trace",
    "union_drift",
    "span_merge",
    "trace_assembly",
    "span_log_correlation",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "orders_with_returns",
    "topk_orders_per_customer",
    "events_daily",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "text_stats",
    "lang_id",
    "ann_cosine",
    "ann_lsh",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("duo_spark_bench")

    # JVM/codegen warmup on the smallest scale
    warm_dir = "/root/testdata/sf0.001"
    for name in ("pricing_summary", "logs_search"):
        _force(QUERIES[name][0](spark, warm_dir))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name][0]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
