"""Round-7 late additions: collocation lift, Markov transitions,
count-min sketch, bloom runtime filter."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from duo_spark.operators.sessions import transition_matrix
from duo_spark.operators.sketch import (
    bloom_build,
    bloom_might_contain,
    cms_lookup,
    cms_merge,
    cms_sketch,
)
from duo_spark.operators.text import collocation_lift


# collocation lift
# ---------------------------------------------------------------------


def test_collocation_lift_exact_values(spark):
    # "a b" appears 3x; a appears 4x, b 3x. N_uni = 12, N_bi = 8
    # (each 3-token doc contributes 2 bigrams).
    docs = spark.createDataFrame(
        [
            Row(text="a b c"),
            Row(text="a b c"),
            Row(text="a b c"),
            Row(text="a x z"),
        ]
    )
    out = collocation_lift(docs, "text", min_count=3, k=10).collect()
    rows = {r["bigram"]: r for r in out}
    ab = rows["a b"]
    assert (ab["n_pair"], ab["n_left"], ab["n_right"]) == (3, 4, 3)
    # lift = 3 * 12^2 / (8 * 4 * 3) = 432/96 = 4.5
    assert ab["lift"] == 4.5
    # "b c" (3x, b=3, c=3): 3*144/(8*9) = 6.0 — ranks first
    assert out[0]["bigram"] == "b c"
    assert out[0]["lift"] == 6.0


def test_collocation_lift_min_count_and_fallback(spark):
    docs = spark.createDataFrame(
        [Row(text="p q"), Row(text="solo"), Row(text="p q")]
    )
    out = collocation_lift(docs, "text", min_count=2, k=10).collect()
    # "solo" (short-text fallback gram, 1 token) never scores; "p q"
    # survives min_count=2
    assert [r["bigram"] for r in out] == ["p q"]


# transition matrix
# ---------------------------------------------------------------------


def test_transition_matrix_counts_and_probs(spark):
    rows = [
        # user 1: a -> b -> a -> c
        Row(u=1, e="a", t=1, i=1),
        Row(u=1, e="b", t=2, i=2),
        Row(u=1, e="a", t=3, i=3),
        Row(u=1, e="c", t=4, i=4),
        # user 2: a -> b
        Row(u=2, e="a", t=1, i=5),
    ]
    rows.append(Row(u=2, e="b", t=2, i=6))
    df = spark.createDataFrame(rows)
    out = {
        (r["from_event"], r["to_event"]): r
        for r in transition_matrix(df, "u", "e", "t", "i").collect()
    }
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "c")]["n"] == 1
    assert out[("b", "a")]["n"] == 1
    # a's row is stochastic: 2/3 + 1/3
    assert out[("a", "b")]["p"] == round(2 / 3, 6)
    assert out[("a", "c")]["p"] == round(1 / 3, 6)
    # no pair crosses users (u2's 'b' has no successor)
    assert ("c", "a") not in out and ("b", "b") not in out


def test_transition_matrix_tiebreak_makes_equal_ts_deterministic(spark):
    df = spark.createDataFrame(
        [Row(u=1, e="x", t=5, i=2), Row(u=1, e="y", t=5, i=1)]
    )
    out = transition_matrix(df, "u", "e", "t", "i").collect()
    # ordered by (t, i): y precedes x
    assert [(r["from_event"], r["to_event"]) for r in out] == [("y", "x")]


# count-min sketch
# ---------------------------------------------------------------------


def test_cms_never_underestimates(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    est = cms_lookup(
        cms_sketch(ev, "user_id", w=64, d=4),  # tiny w forces collisions
        exact.select("user_id"),
        "user_id",
        w=64,
        d=4,
    )
    under = (
        exact.join(est, "user_id")
        .filter(F.col("estimate") < F.col("n"))
        .count()
    )
    assert under == 0


def test_cms_merge_equals_whole(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a, b = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    merged = cms_merge(
        cms_sketch(a, "user_id", w=128), cms_sketch(b, "user_id", w=128)
    )
    whole = cms_sketch(ev, "user_id", w=128)
    diff = (
        merged.alias("m")
        .join(whole.alias("w"), ["row", "bucket"], "full")
        .filter(
            F.coalesce(F.col("m.count"), F.lit(0))
            != F.coalesce(F.col("w.count"), F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([Row(k=7, w=5), Row(k=7, w=2), Row(k=9, w=1)])
    sk = cms_sketch(df, "k", w=256, d=4, weight_col="w")
    est = {
        r["k"]: r["estimate"]
        for r in cms_lookup(
            sk, df.select("k").distinct(), "k", w=256, d=4
        ).collect()
    }
    assert est[7] >= 7 and est[9] >= 1


# bloom filter
# ---------------------------------------------------------------------


def test_bloom_no_false_negatives(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = cust.filter("c_nationkey = 7").select("c_custkey")
    words = bloom_build(dim, "c_custkey", m=2048, k=4)
    assert len(words) == 2048 // 64
    missed = dim.filter(
        ~bloom_might_contain(F.col("c_custkey"), words, m=2048, k=4)
    ).count()
    assert missed == 0


def test_bloom_pass_superset_of_exact_and_empty_dim(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = cust.filter("c_nationkey = 7").select("c_custkey")
    words = bloom_build(dim, "c_custkey", m=2048, k=4)
    n_pass = orders.filter(
        bloom_might_contain(F.col("o_custkey"), words, m=2048, k=4)
    ).count()
    n_exact = orders.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        "left_semi",
    ).count()
    assert n_pass >= n_exact
    # empty build side -> all-zero bitmap -> nothing passes
    empty = bloom_build(dim.filter("c_custkey < 0"), "c_custkey", m=2048, k=4)
    assert set(empty) == {0}
    assert (
        orders.filter(
            bloom_might_contain(F.col("o_custkey"), empty, m=2048, k=4)
        ).count()
        == 0
    )


def test_bloom_fast_path_no_false_negatives_and_differs(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = cust.filter("c_nationkey = 7").select("c_custkey")
    words = bloom_build(dim, "c_custkey", m=2048, k=4, portable=False)
    missed = dim.filter(
        ~bloom_might_contain(
            F.col("c_custkey"), words, m=2048, k=4, portable=False
        )
    ).count()
    assert missed == 0
    n_pass = orders.filter(
        bloom_might_contain(
            F.col("o_custkey"), words, m=2048, k=4, portable=False
        )
    ).count()
    n_exact = orders.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        "left_semi",
    ).count()
    assert n_pass >= n_exact
    # the two hash families lay out different bitmaps — build and
    # probe must agree on the flag
    assert words != bloom_build(dim, "c_custkey", m=2048, k=4)


# key skew profile
# ---------------------------------------------------------------------


def test_key_skew_profile_uniform_and_skewed(spark):
    from duo_spark.operators.skew import key_skew_profile

    uniform = spark.createDataFrame([Row(k=i) for i in (1, 2, 3, 4)])
    r = key_skew_profile(uniform, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (4, 4, 1)
    assert r["gini"] == 0.0 and r["top1_share"] == 0.25
    # counts [1,1,1,97]: gini = (2*(1+2+3+4*97) - 5*100)/(4*100) = 0.72
    skewed = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=3)] + [Row(k=9)] * 97
    )
    r = key_skew_profile(skewed, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (100, 4, 97)
    assert r["top1_share"] == 0.97
    assert r["gini"] == 0.72
    assert r["p50_count"] == 1.0


def test_key_skew_profile_ignores_nulls(spark):
    from duo_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [Row(k=1), Row(k=None), Row(k=1)], "k int"
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"]) == (2, 1)


def test_cms_grouped_sketch_merge_equals_whole(spark, sf_dir):
    """group_cols path: per-group registers summed across groups equal
    the ungrouped sketch — the identity the sliding-window query
    builds on."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "half", F.col("event_id") % 2
    )
    grouped = cms_sketch(ev, "user_id", w=128, group_cols=["half"])
    folded = grouped.groupBy("row", "bucket").agg(
        F.sum("count").alias("count")
    )
    whole = cms_sketch(ev, "user_id", w=128)
    diff = (
        folded.alias("f")
        .join(whole.alias("w"), ["row", "bucket"], "full")
        .filter(
            F.coalesce(F.col("f.count"), F.lit(0))
            != F.coalesce(F.col("w.count"), F.lit(0))
        )
        .count()
    )
    assert diff == 0
