"""Round-10 operators: readability, zipf_slope, column_mi.

Hand-computed pins for the formula layer; the gate queries cover the
sf-table shapes and the DuckDB replays."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- readability

def test_readability_hand_computed(spark):
    from duo_spark.operators.text import readability

    # "The cat sat. The cat ran! It hid?" -> 8 words, 3 sentences,
    # vowel groups: e,a,a,e,a,a,i,i = 8
    docs = spark.createDataFrame(
        [(1, "The cat sat. The cat ran! It hid?")], "doc_id long, text string"
    )
    r = readability(docs).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (8, 3, 8)
    want = 206.835 - 1.015 * (8 / 3) - 84.6 * (8 / 8)
    assert r.flesch == round(want, 6)


def test_readability_empty_and_no_punct(spark):
    from duo_spark.operators.text import readability

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "no terminal punctuation here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability(docs).collect()}
    assert out[1].n_words == 0 and out[1].flesch == 0.0
    assert out[2].n_words == 0 and out[2].flesch == 0.0
    # sentence floor at 1 keeps the formula defined
    assert out[3].n_sentences == 1 and out[3].n_words == 4


# ---------------------------------------------------------------- zipf_slope

def test_zipf_slope_ideal_corpus_is_minus_one(spark):
    from duo_spark.operators.text import zipf_slope

    # frequencies exactly proportional to 1/rank -> slope exactly -1
    # on the log-log fit (freq = 840/r for r=1..8 are all integers)
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * (840 // r)
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = zipf_slope(docs, top_k=8).collect()[0]
    assert row.n_ranked == 8
    assert abs(row.zipf_slope - (-1.0)) < 1e-6
    assert abs(row.zipf_intercept - math.log(840)) < 1e-6


def test_zipf_slope_flat_corpus_is_zero(spark):
    from duo_spark.operators.text import zipf_slope

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(50)))], "doc_id long, text string"
    )
    row = zipf_slope(docs).collect()[0]
    assert row.zipf_slope == 0.0  # every token once -> flat head
    assert row.n_tokens == 50 and row.n_types == 50


def test_zipf_slope_rank_tiebreak_deterministic(spark):
    from duo_spark.operators.text import zipf_slope

    # two tokens with equal counts: rank order must come from the
    # token string, not partition luck — run twice, same answer
    docs = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    a = zipf_slope(docs).collect()[0]
    b = zipf_slope(docs.repartition(7)).collect()[0]
    assert a == b


# ----------------------------------------------------------------- column_mi

def test_column_mi_independent_is_zero(spark):
    from duo_spark.operators.profile import column_mi

    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = column_mi(df, "a", "b").collect()[0]
    assert (r.n_rows, r.n_a, r.n_b) == (100, 2, 2)
    assert r.mi == 0.0 and r.nmi == 0.0


def test_column_mi_bijection_nmi_one(spark):
    from duo_spark.operators.profile import column_mi

    df = spark.createDataFrame(
        [("x", "u")] * 30 + [("y", "v")] * 70, "a string, b string"
    )
    r = column_mi(df, "a", "b").collect()[0]
    # MI == H(a) == H(b) for a bijection
    h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert r.mi == round(h, 6) and r.nmi == 1.0


def test_column_mi_constant_column_guard(spark):
    from duo_spark.operators.profile import column_mi

    df = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r = column_mi(df, "a", "b").collect()[0]
    assert r.n_a == 1 and r.mi == 0.0 and r.nmi == 0.0  # H(a)=0 -> guard


def test_column_mi_null_is_a_category(spark):
    from duo_spark.operators.profile import column_mi

    # NULL in a perfectly paired with 'u': still a bijection
    df = spark.createDataFrame(
        [(None, "u")] * 40 + [("y", "v")] * 60, "a string, b string"
    )
    r = column_mi(df, "a", "b").collect()[0]
    assert r.n_a == 2 and r.nmi == 1.0
