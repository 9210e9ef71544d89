"""Decontamination containment + repetition ratio + PII scrub
semantics against driver-side references."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from duo_spark.operators import text as text_ops
from duo_spark.operators.decontam import contaminated_docs, ngram_containment

DOCS = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),
    (101, "completely unrelated text about spark shuffles and partitions here"),
    (102, "quick brown fox jumps over the lazy dog"),  # contains probe 2's grams
    (103, "a b"),  # shorter than n
]
PROBES = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark shuffles and partitions"),
]


def _grams(t: str, n: int = 3) -> set[str]:
    w = t.split()
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _reference(threshold: float = 0.5):
    out = {}
    for pid, pt in PROBES:
        pg = _grams(pt)
        for did, dt in DOCS:
            c = len(pg & _grams(dt)) / len(pg)
            if c >= threshold:
                out[(did, pid)] = c
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    probes = spark.createDataFrame(PROBES, "probe_id long, text string")
    return docs, probes


def test_containment_matches_reference(spark, frames):
    docs, probes = frames
    got = {
        (r.doc_id, r.probe_id): r.containment
        for r in ngram_containment(docs, probes, threshold=0.5).collect()
    }
    want = _reference(0.5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_contaminated_docs_rollup(spark, frames):
    docs, probes = frames
    rows = {r.doc_id: (r.max_containment, r.n_probes)
            for r in contaminated_docs(docs, probes, threshold=0.5).collect()}
    want = _reference(0.5)
    by_doc: dict[int, list[float]] = {}
    for (d, _p), c in want.items():
        by_doc.setdefault(d, []).append(c)
    assert rows == {d: (pytest.approx(max(cs)), len(cs)) for d, cs in by_doc.items()}


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),      # 'a b c' x3 of 7 grams
            (2, "x y z w v u"),            # all grams unique
            (3, "a b"),                    # short: single gram, ratio 1
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.top_ngram_count, r.ngram_count, r.repetition_ratio)
           for r in text_ops.repetition_ratio(df).collect()}
    assert got[1] == (3, 7, pytest.approx(3 / 7))
    assert got[2] == (1, 4, pytest.approx(1 / 4))
    assert got[3] == (1, 1, pytest.approx(1.0))


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "card 4111111111111111 pin 123 ok"),
            (3, "clean text stays clean"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.s for r in df.select("doc_id", text_ops.scrub_pii("text").alias("s")).collect()}
    assert "<EMAIL>" in got[1] and "<PHONE>" in got[1]
    assert "john" not in got[1] and "555" not in got[1]
    assert "<NUMBER>" in got[2] and "4111111111111111" not in got[2]
    assert "pin 123 ok" in got[2]  # short digit runs survive
    assert got[3] == "clean text stays clean"


# ---------------------------------------------------------------------
# duplicate_frames (operators/multimodal.py)
# ---------------------------------------------------------------------

def test_duplicate_frames_cross_asset_only(spark):
    """Frames shared WITHIN one asset don't count; byte-identical
    frames across assets do; counts and ratios exact."""
    from duo_spark.operators.multimodal import duplicate_frames

    a = b"A" * 8 + b"B" * 8          # frames: AAAA.., BBBB..
    b_ = b"A" * 8 + b"C" * 8         # shares frame A with a
    c = b"D" * 8 + b"D" * 8          # internal repeat only
    media = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b_)), (3, bytearray(c))],
        "media_id long, content binary",
    )
    got = {r.media_id: (r.n_frames, r.n_dup_frames, r.dup_ratio)
           for r in duplicate_frames(media, frame_bytes=8).collect()}
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 0, 0.0)     # self-duplicate frames not flagged
