"""Benchmark decontamination: n-gram containment of a probe set in a
training corpus.

Before training, a corpus is swept for documents that contain the
evaluation benchmarks (exact-duplicate leakage hides behind small
edits, so the standard test is n-gram overlap: a doc is contaminated
if it contains ≥ t of a benchmark item's word n-grams). The reference
has no such surface — north-star extension, built for the real shape
of the problem:

- the PROBE side (benchmark items) is small by definition — its
  distinct-gram index and per-probe gram counts are broadcast;
- the CORPUS side explodes to (gram hash, doc) and map-side
  broadcast-joins the probe index — the only shuffle is the
  (doc, probe) hit-count aggregate, bounded by actual overlap;
- grams travel as xxhash64 longs, not strings (same trick and the
  same ~1e-14 collision caveat as dedup._hashed_shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duo_spark.operators.dedup import shingles


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int, out_id: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.transform(shingles(text_col, n), lambda s: F.xxhash64(s))
        ).alias("_gh"),
    )


def ngram_containment(
    docs: DataFrame,
    probes: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    probe_id: str = "probe_id",
    probe_text: str = "text",
) -> DataFrame:
    """(doc_id, probe_id, containment) for pairs with containment ≥
    ``threshold``, where containment = |probe grams ∩ doc grams| /
    |probe grams| over distinct word n-grams."""
    pg = _gram_hashes(probes, probe_id, probe_text, n, probe_id)
    pcount = pg.groupBy(probe_id).agg(F.count(F.lit(1)).alias("_pn"))
    dg = _gram_hashes(docs, doc_id, doc_text, n, doc_id)
    hits = (
        dg.join(F.broadcast(pg), "_gh")
        .groupBy(doc_id, probe_id)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        hits.join(F.broadcast(pcount), probe_id)
        .select(
            doc_id,
            probe_id,
            (F.col("_hits") / F.col("_pn")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def contaminated_docs(
    docs: DataFrame,
    probes: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    probe_id: str = "probe_id",
    probe_text: str = "text",
) -> DataFrame:
    """One row per contaminated document: worst probe containment and
    the number of probes it leaks — the drop-list for corpus cleaning."""
    pairs = ngram_containment(
        docs, probes, threshold, n, doc_id, doc_text, probe_id, probe_text
    )
    return pairs.groupBy(doc_id).agg(
        F.max("containment").alias("max_containment"),
        F.count(F.lit(1)).alias("n_probes"),
    )


def contamination_report(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    probe_id: str = "probe_id",
    probe_text: str = "text",
) -> DataFrame:
    """Per-probe gram-level contamination (round 8): for each eval
    probe, the fraction of its distinct word n-grams that appear
    ANYWHERE in the training corpus — the dataset-card number next to
    the membership check (:func:`ngram_containment` answers "which
    documents leak probe X"; this answers "how much of probe X exists
    in the corpus at all", the quantity eval papers report).

    Output: ``(probe_id, n_grams, n_leaked, leak_ppm)`` — exact
    integer counts, ppm = floor(leaked·10⁶/grams).

    Scale shape: corpus grams reduce to DISTINCT hashes once (one
    map-side-combined aggregate — the shuffle carries distinct grams,
    never the corpus), probes broadcast against them as an equi-join.
    """
    pg = _gram_hashes(probes, probe_id, probe_text, n, probe_id)
    pcount = pg.groupBy(probe_id).agg(F.count(F.lit(1)).alias("n_grams"))
    corpus_grams = (
        _gram_hashes(docs, doc_id, doc_text, n, doc_id)
        .select("_gh")
        .distinct()
    )
    leaked = (
        corpus_grams.join(F.broadcast(pg), "_gh")
        .groupBy(probe_id)
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    return (
        pcount.join(leaked, probe_id, "left")
        .select(
            probe_id,
            "n_grams",
            F.coalesce("n_leaked", F.lit(0)).alias("n_leaked"),
            F.floor(
                F.coalesce("n_leaked", F.lit(0)) * F.lit(1_000_000)
                / F.col("n_grams")
            ).cast("long").alias("leak_ppm"),
        )
    )
