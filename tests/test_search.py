"""BM25 semantics: scores match a driver-side reference implementation
exactly; top-k ordering is total; non-matching docs are absent."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from duo_spark.operators import search

CORPUS = [
    (1, "spark window merge spark spark"),
    (2, "window vector window"),
    (3, "table scan filter"),
    (4, "spark"),
    (5, ""),
    (6, "Vector MERGE vector, spark!  window"),
]
QUERY = ["spark", "window", "vector"]


def _reference_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dft = Counter(t for ts in toks.values() for t in set(ts) if t in terms)
    out = {}
    for i, ts in toks.items():
        tf = Counter(t for t in ts if t in terms)
        score = 0.0
        for t, f in tf.items():
            idf = math.log(1 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            score += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(ts) / avgdl))
        if tf:
            out[i] = score
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_reference(spark, corpus_df):
    got = {
        r.doc_id: r.score
        for r in search.bm25_scores(corpus_df, QUERY).collect()
    }
    want = _reference_bm25(CORPUS, set(QUERY))
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_order_and_cut(spark, corpus_df):
    rows = search.bm25_topk(corpus_df, QUERY, k=3).collect()
    assert len(rows) == 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    want = _reference_bm25(CORPUS, set(QUERY))
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r.doc_id for r in rows] == [i for i, _ in top]


def test_bm25_ignores_non_matching_docs(spark, corpus_df):
    ids = {r.doc_id for r in search.bm25_scores(corpus_df, ["zzz"]).collect()}
    assert ids == set()


def test_tfidf_top_terms_manual(spark):
    """Pin tf*ln(N/df) and the (rounded score, term) ranking on a
    3-doc corpus computed by hand."""
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = search.tfidf_top_terms(docs, top=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.score) for r in out}
    ln = math.log
    # doc 1: apple tf2 df1 -> 2*ln(3); banana tf1 df2 -> ln(1.5)
    assert got[(1, 1)] == ("apple", round(2 * ln(3.0), 6))
    assert got[(1, 2)] == ("banana", round(ln(1.5), 6))
    # doc 3: cherry tf3 df2 -> 3*ln(1.5)=1.216 beats durian tf1 df1 -> ln(3)=1.099
    assert got[(3, 1)] == ("cherry", round(3 * ln(1.5), 6))
    assert got[(3, 2)] == ("durian", round(ln(3.0), 6))
    assert all(r.rank <= 2 for r in out)


# ---------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------

def test_rrf_fuse_union_and_formula(spark):
    from duo_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.5)], "doc_id long, score double")
    got = {r.doc_id: round(r.rrf, 9) for r in rrf_fuse(a, b, k=10).collect()}
    assert got == {
        1: round(1/11, 9),            # rank 1 in a only
        2: round(1/12 + 1/11, 9),     # rank 2 in a, rank 1 in b
        3: round(1/13, 9),
        4: round(1/12, 9),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        rrf_fuse(a, b, k=0)


def test_rrf_fuse_tie_break_deterministic(spark):
    from duo_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(5, 1.0), (3, 1.0), (9, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(9, 2.0)], "doc_id long, score double")
    got = {r.doc_id: round(r.rrf, 9) for r in rrf_fuse(a, b, k=1).collect()}
    # equal scores rank by id asc: 3->1, 5->2, 9->3
    assert got == {3: 0.5, 5: round(1/3, 9), 9: round(1/4 + 1/2, 9)}
