"""Deterministic hash sampling: reproducibility, monotone nesting,
stratified thresholds, and approximate rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from duo_spark.operators.sampling import hash_sample, stratified_hash_sample


def _ids(spark, n=2000):
    return spark.range(1, n + 1).withColumnRenamed("id", "doc_id")


def test_sample_deterministic_and_nested(spark):
    df = _ids(spark)
    s10a = {r.doc_id for r in hash_sample(df, 0.10).collect()}
    s10b = {r.doc_id for r in hash_sample(df, 0.10).collect()}
    s50 = {r.doc_id for r in hash_sample(df, 0.50).collect()}
    assert s10a == s10b
    assert s10a <= s50
    assert 0.05 < len(s10a) / 2000 < 0.15
    assert 0.45 < len(s50) / 2000 < 0.55


def test_salt_changes_selection(spark):
    df = _ids(spark)
    a = {r.doc_id for r in hash_sample(df, 0.2, salt=0).collect()}
    b = {r.doc_id for r in hash_sample(df, 0.2, salt=99).collect()}
    assert a != b


def test_stratified_rates(spark):
    df = _ids(spark, 3000).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    out = stratified_hash_sample(df, {"en": 0.9, "de": 0.1}).groupBy("lang").count()
    counts = {r.lang: r["count"] for r in out.collect()}
    assert 0.8 * 1000 < counts["en"] <= 1000
    assert 50 < counts["de"] < 350


def test_stratified_default_drops_unlisted(spark):
    df = _ids(spark, 100).withColumn("lang", F.lit("fr"))
    assert stratified_hash_sample(df, {"en": 1.0}).count() == 0
    assert stratified_hash_sample(df, {"en": 1.0}, default_fraction=1.0).count() == 100


def test_sample_is_scan_side_filter(spark):
    df = _ids(spark)
    plan = hash_sample(df, 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure filter projection


def test_weighted_sample_prefix_and_bias(spark):
    """E-S keys are fixed per row, so the k=5 sample is a prefix of the
    k=20 sample; a row with overwhelming weight is (near-)surely in."""
    from duo_spark.operators.sampling import weighted_sample

    rows = [(i, 10) for i in range(100)] + [(100, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    k5 = [r.doc_id for r in weighted_sample(df, 5, "w").orderBy("_key").collect()]
    k20 = [r.doc_id for r in weighted_sample(df, 20, "w").orderBy("_key").collect()]
    assert k20[:5] == k5
    assert 100 in k20  # weight 1e6x everyone else -> key ~1e-6x smaller
    # deterministic across invocations
    again = [r.doc_id for r in weighted_sample(df, 5, "w").orderBy("_key").collect()]
    assert again == k5


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from duo_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 5)],
        "doc_id long, w long",
    )
    got = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_weighted_sample_excludes_null_ids(spark):
    """A null id hashes to a null key, which Spark's ascending sort
    would place FIRST — the row must be excluded, not sampled."""
    from duo_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(None, 1000), (1, 5), (2, 5)], "doc_id long, w long"
    )
    got = {r.doc_id for r in weighted_sample(df, 2, "w").collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------------
# sample_per_key (deterministic per-key fixed-size sample)
# ---------------------------------------------------------------------

def test_sample_per_key_exact_size_and_determinism(spark):
    from duo_spark.operators.sampling import sample_per_key

    rows = [(i, f"k{i % 3}") for i in range(90)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    out = sample_per_key(df, key="key", n=4, id_col="doc_id")
    got = sorted((r.key, r.doc_id, r.sample_rank) for r in out.collect())
    # exact n per key, min(n, size) for small groups
    from collections import Counter
    sizes = Counter(k for k, _, _ in got)
    assert sizes == {"k0": 4, "k1": 4, "k2": 4, "rare": 1}
    assert got == sorted((r.key, r.doc_id, r.sample_rank) for r in out.collect())


def test_sample_per_key_growth_consistency(spark):
    """Adding rows can only evict by better hash rank — selections
    from the small corpus that still rank <= n stay selected; ranks of
    surviving rows never improve by removal of others."""
    from duo_spark.operators.sampling import sample_per_key
    from duo_spark.operators.sampling import hash_bucket

    small = spark.createDataFrame([(i, "k") for i in range(40)], "doc_id long, key string")
    big = spark.createDataFrame([(i, "k") for i in range(80)], "doc_id long, key string")
    s = {r.doc_id for r in sample_per_key(small, "key", 6, "doc_id").collect()}
    b = {r.doc_id for r in sample_per_key(big, "key", 6, "doc_id").collect()}
    # every selected-in-big doc that existed in small was selected in small
    assert {d for d in b if d < 40} <= s


def test_sample_per_key_rejects_bad_n(spark):
    from duo_spark.operators.sampling import sample_per_key

    df = spark.createDataFrame([(1, "k")], "doc_id long, key string")
    import pytest
    with pytest.raises(ValueError, match="n must be"):
        sample_per_key(df, "key", 0, "doc_id")


def test_sample_per_key_partitioning_invariant(spark):
    """The two-phase prefilter must not change the result under any
    input partitioning (phase-1 locality is an optimization, never a
    semantics change)."""
    from duo_spark.operators.sampling import sample_per_key

    rows = [(i, f"k{i % 2}") for i in range(200)]
    base = spark.createDataFrame(rows, "doc_id long, key string")
    want = sorted((r.key, r.doc_id, r.sample_rank) for r in
                  sample_per_key(base.coalesce(1), "key", 7, "doc_id").collect())
    for parts in (3, 16, 64):
        got = sorted((r.key, r.doc_id, r.sample_rank) for r in
                     sample_per_key(base.repartition(parts), "key", 7, "doc_id").collect())
        assert got == want, parts


# ---------------------------------------------------------------------
# leakage_safe_split (round 5)
# ---------------------------------------------------------------------

def test_leakage_safe_split_cluster_atomic(spark):
    """Every member of a cluster gets the same split — near-dups can
    never straddle train/holdout — and the fraction is roughly hit."""
    from duo_spark.operators.sampling import leakage_safe_split

    rows = [(i, i % 97) for i in range(1000)]
    labels = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = leakage_safe_split(labels, train_fraction=0.8, salt=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(v) == 1 for v in by_cluster.values())
    train = sum(1 for r in out if r.split == "train")
    assert 0.6 < train / len(out) < 0.95


def test_leakage_safe_split_monotone(spark):
    """Growing train_fraction only moves clusters INTO train."""
    from duo_spark.operators.sampling import leakage_safe_split

    labels = spark.createDataFrame(
        [(i, i) for i in range(300)], "doc_id long, cluster_id long"
    )
    t50 = {r.doc_id for r in leakage_safe_split(labels, 0.5).collect()
           if r.split == "train"}
    t90 = {r.doc_id for r in leakage_safe_split(labels, 0.9).collect()
           if r.split == "train"}
    assert t50 <= t90


# ---------------------------------------------------------------------
# temperature mixture (round 5)
# ---------------------------------------------------------------------

def test_temperature_rates_math(spark):
    """q ∝ p^α: α=1 keeps natural shares; α=0.5 flattens toward
    uniform (tail stratum's q share rises); keep_rate realizes the
    target and caps at 1."""
    import math
    from duo_spark.operators.sampling import temperature_rates

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    r1 = {r.stratum: r for r in temperature_rates(df, alpha=1.0).collect()}
    assert abs(r1["big"].q - 0.9) < 1e-9 and abs(r1["small"].q - 0.1) < 1e-9

    r5 = {r.stratum: r for r in
          temperature_rates(df, alpha=0.5, target_rows=500).collect()}
    z = math.sqrt(900) + math.sqrt(100)
    assert abs(r5["small"].q - math.sqrt(100) / z) < 1e-9
    assert r5["small"].q > 0.1            # tail upweighted
    for s in ("big", "small"):
        want_keep = min(500 * r5[s].q / r5[s].n, 1.0)
        assert abs(r5[s].keep_rate - want_keep) < 1e-6


def test_temperature_sample_deterministic_and_capped(spark):
    from duo_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r.doc_id for r in
               temperature_sample(df, alpha=0.5, target_rows=400, salt=3).collect())
    b = sorted(r.doc_id for r in
               temperature_sample(df, alpha=0.5, target_rows=400, salt=3).collect())
    assert a == b and 0 < len(a) < 1000
    # target_rows >= corpus: keep everything (rates cap at 1)
    full = temperature_sample(df, alpha=0.5, target_rows=10_000).count()
    assert full == 1000
