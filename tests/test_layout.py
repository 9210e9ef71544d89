"""Z-order layout clustering (operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duo_spark.operators.layout import spread16, with_zorder, zorder_repartition, zvalue2


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    import random
    rng = random.Random(5)
    rows = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(200)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zvalue2(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == _interleave_ref(r.x, r.y), (r.x, r.y)


def test_with_zorder_file_assignment(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1000, 65535) for y in (0, 1000, 65535)], "x long, y long"
    )
    out = with_zorder(df, "x", "y", num_files=64).collect()
    for r in out:
        assert r.file_id == _interleave_ref(r.x, r.y) >> 26
        assert 0 <= r.file_id < 64
    with pytest.raises(ValueError, match="power of two"):
        with_zorder(df, "x", "y", num_files=48)


def test_zorder_locality_beats_single_dim_sort(spark):
    """The point of the layout: a filter on the SECOND dimension can
    prune files. Both layouts tile the key space, so total coverage is
    equal — the discriminator is how many files a narrow y-range query
    must touch: an x-sorted layout leaves every file full-width in y
    (no pruning); z-order bounds y per file."""
    import random
    rng = random.Random(11)
    rows = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long")

    def files_touched(summary, lo, hi):
        return sum(1 for r in summary if r.max_y >= lo and r.min_y <= hi)

    zf = (
        with_zorder(df, "x", "y", num_files=16)
        .groupBy("file_id")
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    xf = (
        df.withColumn(
            "file_id",
            F.ntile(16).over(__import__("pyspark").sql.Window.orderBy("x")),
        )
        .groupBy("file_id")
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    # a 1/16-height horizontal slab of the key space
    z_hits = files_touched(zf, 30_000, 30_000 + 4_095)
    x_hits = files_touched(xf, 30_000, 30_000 + 4_095)
    assert x_hits == 16                      # x-sort cannot prune on y
    assert z_hits <= 8, (z_hits, x_hits)     # z-order prunes >= half


def test_zorder_repartition_sorted_and_complete(spark):
    import random
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 65535), rng.randint(0, 65535)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = zorder_repartition(df, "x", "y", num_partitions=8)
    assert out.count() == 5000
    assert set(out.columns) == {"id", "x", "y"}
    # partitions are z-contiguous: max z of partition p <= min z of p+1
    zs = out.withColumn("z", zvalue2(F.col("x"), F.col("y"))).withColumn(
        "p", F.spark_partition_id())
    rng_by_p = {r.p: (r.lo, r.hi) for r in
                zs.groupBy("p").agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()}
    ps = sorted(rng_by_p)
    for a, b in zip(ps, ps[1:]):
        assert rng_by_p[a][1] <= rng_by_p[b][0]
