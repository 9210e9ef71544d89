"""Round-11 operators: sentence-level dedup composition (the CCNet
within-corpus pass) and the PNG image container."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sentence_dedup_first_occurrence_and_boilerplate(spark):
    from duo_spark.operators.text import sentence_dedup

    docs = spark.createDataFrame(
        [
            # "accept cookies" appears in 3 docs -> boilerplate at k=2
            (1, "Alpha beta gamma. Accept  cookies. Unique one."),
            (2, "accept cookies! Alpha beta gamma. Unique two."),
            (3, "ACCEPT COOKIES? Unique three."),
            (4, "Unique four only."),
            (5, "   "),  # splits to zero sentences
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in sentence_dedup(docs, max_doc_freq=2).collect()
    }
    assert len(out) == 5
    # doc 1: all three sentences first occurrences; "Accept  cookies."
    # normalizes to the same form as doc 2/3's -> df=3 > 2 -> dropped
    assert (out[1].n_sentences, out[1].n_kept) == (3, 2)
    assert out[1].text_dedup == "Alpha beta gamma. Unique one."
    # doc 2: "accept cookies!" boilerplate; "Alpha beta gamma." is a
    # LATER occurrence of doc 1's sentence -> dropped; "Unique two." kept
    assert (out[2].n_sentences, out[2].n_kept) == (3, 1)
    assert out[2].text_dedup == "Unique two."
    assert (out[3].n_sentences, out[3].n_kept) == (2, 1)
    assert out[3].text_dedup == "Unique three."
    assert (out[4].n_sentences, out[4].n_kept) == (1, 1)
    assert out[5].n_sentences == 0 and out[5].text_dedup == ""


def test_sentence_dedup_normalization_variants_match(spark):
    """Case and interior-whitespace variants normalize together, but
    the KEPT sentence is the verbatim first occurrence."""
    from duo_spark.operators.text import sentence_dedup

    docs = spark.createDataFrame(
        [(1, "Hello   World. Tail one."), (2, "hello world. Tail two.")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in sentence_dedup(docs, max_doc_freq=5).collect()}
    assert out[1].text_dedup == "Hello   World. Tail one."
    assert out[2].text_dedup == "Tail two."


def test_sentence_dedup_within_doc_duplicates(spark):
    """A sentence repeated inside ONE doc keeps only its first
    occurrence (df=1 passes the boilerplate gate)."""
    from duo_spark.operators.text import sentence_dedup

    docs = spark.createDataFrame(
        [(7, "Same thing. Other stuff. Same thing. Same thing.")],
        "doc_id long, text string",
    )
    r = sentence_dedup(docs, max_doc_freq=1).collect()[0]
    assert (r.n_sentences, r.n_kept) == (4, 2)
    assert r.text_dedup == "Same thing. Other stuff."
