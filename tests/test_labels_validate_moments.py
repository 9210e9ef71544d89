"""Round-8 operator wave: label resolution / Fleiss kappa, moments
sketch merge algebra, declarative validation, hard negatives."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_resolve_labels_majority_and_tiebreak(spark):
    from duo_spark.operators.labels import resolve_labels

    rows = [
        (1, "a"), (1, "a"), (1, "b"),          # majority a, 2/3
        (2, "x"), (2, "y"),                     # tie -> lexicographic x
        (3, "z"), (3, None),                    # abstention dropped
    ]
    df = spark.createDataFrame(rows, "item int, label string")
    got = {r.item: r for r in resolve_labels(df, "item", "label").collect()}
    assert got[1].label == "a" and got[1].n_votes == 3 and got[1].top_votes == 2
    assert abs(got[1].agreement - round(2 / 3, 6)) < 1e-9
    assert got[2].label == "x" and got[2].agreement == 0.5
    assert got[3].label == "z" and got[3].n_votes == 1 and got[3].agreement == 1.0


def test_fleiss_kappa_perfect_and_chance(spark):
    """Unanimous raters -> kappa 1; the Fleiss textbook identity
    p_o == p_e -> kappa 0 is hard to construct exactly, so assert the
    exact pairwise formula on a hand-computed fixture instead."""
    from duo_spark.operators.labels import fleiss_kappa

    unanimous = spark.createDataFrame(
        [(i, "lab") for i in range(4) for _ in range(3)], "item int, label string"
    )
    r = fleiss_kappa(unanimous, "item", "label").collect()[0]
    assert r.p_o == 1.0 and r.kappa == 1.0

    # fixture: item 1 votes (a,a,b); item 2 votes (a,b)
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")],
        "item int, label string",
    )
    r = fleiss_kappa(df, "item", "label").collect()[0]
    # p_o: item1 = (2*1 + 0) / (3*2) = 1/3; item2 = 0; mean = 1/6
    assert abs(r.p_o - round(1 / 6, 6)) < 1e-9
    # p_e: shares a=3/5, b=2/5 -> 9/25 + 4/25 = 13/25
    assert abs(r.p_e - 0.52) < 1e-9
    want_kappa = round((1 / 6 - 0.52) / (1 - 0.52), 6)
    assert abs(r.kappa - want_kappa) < 1e-9
    assert r.n_items == 2 and r.n_ratings == 5


def test_moments_merge_equals_whole_table_sketch(spark, sf_dir):
    """merge(sketch(A), sketch(B)) == sketch(A ⊎ B) EXACTLY — decimal
    power sums have no float order-dependence."""
    from duo_spark.operators.sketch import moments_merge, moments_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = moments_sketch(ev.filter(F.col("event_id") % 2 == 0), ["event_type"], "value")
    b = moments_sketch(ev.filter(F.col("event_id") % 2 == 1), ["event_type"], "value")
    merged = {
        r.event_type: (r.n, r.vmin, r.vmax, r.m1, r.m2, r.m3, r.m4)
        for r in moments_merge(a, b, group_cols=["event_type"]).collect()
    }
    whole = {
        r.event_type: (r.n, r.vmin, r.vmax, r.m1, r.m2, r.m3, r.m4)
        for r in moments_sketch(ev, ["event_type"], "value").collect()
    }
    assert merged == whole and merged


def test_moments_stats_match_exact_aggregates(spark, sf_dir):
    """mean/stddev from the sketch equal the direct exact aggregates
    over the scaled values (same arithmetic, sketch just persists)."""
    from duo_spark.operators.sketch import moments_sketch, moments_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stats = {
        r.event_type: r
        for r in moments_stats(
            moments_sketch(ev, ["event_type"], "value"), ["event_type"]
        ).collect()
    }
    direct = ev.filter(F.col("value").isNotNull()).select(
        "event_type", (F.round(F.col("value") * 100).cast("long") / 100.0).alias("v")
    ).groupBy("event_type").agg(
        F.avg("v").alias("mean"), F.stddev_pop("v").alias("sd"),
        F.min("v").alias("vmin"), F.max("v").alias("vmax"),
    )
    for r in direct.collect():
        s = stats[r.event_type]
        assert abs(s.mean - r["mean"]) < 1e-4, r.event_type
        assert abs(s.stddev - r.sd) < 1e-4, r.event_type
        assert s.vmin == round(r.vmin, 6) and s.vmax == round(r.vmax, 6)
        # p95 estimate lies in [vmin, vmax] by construction
        assert s.vmin <= s.p95_est <= s.vmax


def test_validate_counts_violations_and_uniqueness(spark):
    from duo_spark.operators.validate import validate

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "F"), (3, 0.0, "Q"), (3, 7.0, None), (None, 1.0, "P")],
        "k int, price double, status string",
    )
    out = {r.rule: r for r in validate(
        df,
        rules={
            "price_positive": "price > 0",
            "status_in_domain": "status IN ('O','F','P')",
        },
        unique=["k"],
    ).collect()}
    assert out["price_positive"].n_violations == 2       # -5 and 0
    assert out["status_in_domain"].n_violations == 2     # Q and NULL
    assert out["unique(k)"].n_violations == 2             # both k=3 rows
    assert all(r.n_rows == 5 for r in out.values())
    assert out["price_positive"].violation_ppm == 400000


def test_validate_foreign_key_counts_orphans(spark):
    from duo_spark.operators.validate import validate

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "k int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    out = {r.rule: r for r in validate(
        child, rules={"k_positive": "k > 0"},
        foreign_keys=[("fk", parent, "pk")],
    ).collect()}
    # 99 is an orphan; NULL fk is exempt
    assert out["fk(fk -> pk)"].n_violations == 1
    assert out["fk(fk -> pk)"].n_rows == 4


def test_validate_rejects_empty_ruleset(spark):
    from duo_spark.operators.validate import validate

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        validate(df, rules={})


def test_hard_negatives_excludes_same_label_and_self(spark, sf_dir):
    from duo_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    out = hard_negatives(emb, anchors, k=5).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    anchor_labels = {r.anchor_id: labels[r.anchor_id] for r in out}
    assert len(out) == 10
    for r in out:
        assert r.vec_id != r.anchor_id
        assert labels[r.vec_id] != anchor_labels[r.anchor_id]
    # ranks are 1..5 per anchor, cosine non-increasing
    for aid in (0, 1):
        rows = sorted([r for r in out if r.anchor_id == aid], key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(rows[i].cosine >= rows[i + 1].cosine for i in range(4))


def test_hard_negatives_plan_no_global_sort(spark, sf_dir):
    """The two-phase reduction must hold: no rank window over the full
    scored set, no Python, label filter before aggregation."""
    from duo_spark.queries import QUERIES

    df = QUERIES["hard_negatives"][0](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan
    assert "Window" not in plan  # two-phase aggregate, not a rank window


def test_hard_negatives_lsh_candidates_valid_and_recall(spark, sf_dir):
    """LSH-mined negatives satisfy the same constraints as exact ones,
    and with 16x4 banding (the moderate-cosine regime — see the
    operator docstring) the top-1 exact negative is recalled for most
    anchors."""
    from duo_spark.operators.similarity import hard_negatives, hard_negatives_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    lsh = hard_negatives_lsh(emb, anchors, k=3, bands=16, planes_per_band=4).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in lsh:
        assert labels[r.vec_id] != labels[r.anchor_id]
        assert r.vec_id != r.anchor_id
    exact = hard_negatives(emb, anchors, k=1).collect()
    top1 = {r.anchor_id: r.vec_id for r in exact}
    got = {(r.anchor_id, r.vec_id) for r in lsh}
    hits = sum(1 for a, v in top1.items() if (a, v) in got)
    assert hits >= len(top1) // 2, (hits, len(top1))


def test_k_anonymity_flags_small_classes(spark):
    from duo_spark.operators.validate import k_anonymity

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", None)] * 3
    df = spark.createDataFrame(rows, "t string, z int")
    r = k_anonymity(df, ["t", "z"], k=3).collect()[0]
    assert r.n_rows == 10 and r.n_classes == 3
    assert r.min_class_size == 2 and not r.k_anonymous
    assert r.n_violating_rows == 2 and r.n_violating_classes == 1
    # NULL quasi values form their own (countable) class
    r3 = k_anonymity(df, ["t", "z"], k=2).collect()[0]
    assert r3.k_anonymous


def test_contamination_report_exact_fixture(spark):
    """Hand-computed leak rates: probe grams vs a 2-doc corpus."""
    from duo_spark.operators.decontam import contamination_report

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z w")], "doc_id long, text string"
    )
    probes = spark.createDataFrame(
        # grams: {a b c, b c d} both leak; {q q q} leaks nothing;
        # {x y z, y z w} both leak
        [(10, "a b c d"), (11, "q q q"), (12, "x y z w")],
        "probe_id long, text string",
    )
    got = {r.probe_id: (r.n_grams, r.n_leaked, r.leak_ppm)
           for r in contamination_report(train, probes, n=3).collect()}
    assert got[10] == (2, 2, 1_000_000)
    assert got[11] == (1, 0, 0)
    assert got[12] == (2, 2, 1_000_000)


def test_packing_stats_invariants(spark, sf_dir):
    """Utilization ∈ (0, 1]; fills never exceed capacity; totals
    reconcile with the packed frame."""
    from pyspark.sql import functions as F

    from duo_spark.operators.sharding import pack_sequences, packing_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(docs, capacity=256, num_shards=8)
    stats = packing_stats(packed, capacity=256).collect()
    assert len(stats) == 8
    for r in stats:
        assert 0 < r.utilization <= 1.0
        assert r.min_fill <= r.p50_fill <= 256
        assert r.total_tokens <= r.n_seqs * 256
    assert sum(r.n_docs for r in stats) == docs.count()
