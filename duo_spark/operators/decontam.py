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


def semantic_decontam(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    threshold: float = 0.8,
    max_benchmark: int = 200_000,
    max_benchmark_bytes: int = 256 << 20,
) -> DataFrame:
    """Embedding-space decontamination (round 11): flag corpus items
    whose nearest BENCHMARK embedding clears ``threshold`` cosine —
    the semantic sibling of :func:`contaminated_docs`, catching the
    paraphrased leakage n-gram containment misses.

    Shape, built for the asymmetry of the real problem: benchmarks
    are 1e3–1e5 items while the corpus is 1e9+, so the benchmark side
    is collected into ONE normalized float64 matrix (guarded by
    ``max_benchmark`` — a benchmark that large is a corpus, use the
    LSH pair path in similarity.py instead) and every corpus
    partition scores against it in a single (batch × dim) @ (dim × n)
    Arrow-batched matmul — no shuffle, no pair materialization, same
    scale pattern as similarity._centroid_sims_udf and the reasons it
    beats per-centroid Column folds.

    Similarities round to 6 decimals BEFORE the argmax (ties break to
    the smallest benchmark id), so an SQL oracle replaying brute-force
    cosine ranks identically. Returns
    ``(id_col, bench_id, sim)`` for corpus rows with
    ``sim >= threshold``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from duo_spark.operators.util import collect_vector_matrix

    bid = bench_id_col or id_col
    # row cap AND byte cap (round-12 VERDICT #5); a benchmark past
    # either is a corpus — use similarity.embedding_near_dup_pairs
    bench_ids, M = collect_vector_matrix(
        benchmark, bid, vec_col,
        max_rows=max_benchmark, max_bytes=max_benchmark_bytes,
        what="benchmark",
        row_knob="max_benchmark", byte_knob="max_benchmark_bytes",
    )
    bnorm = np.linalg.norm(M, axis=1, keepdims=True)
    # fail LOUD on a degenerate benchmark vector: a zero-norm (or NaN)
    # row would turn its sims column NaN, np.argmax would pick the NaN
    # column for EVERY corpus row, and the sweep would silently report
    # zero contamination — the worst possible failure mode here
    bad = ~np.isfinite(bnorm.ravel()) | (bnorm.ravel() == 0)
    if bad.any():
        raise ValueError(
            f"benchmark rows with zero/NaN embeddings: "
            f"{bench_ids[bad][:5].tolist()}"
        )
    M = M / bnorm
    # pre-sort by bench id ONCE so the per-batch argmax's first-max
    # tiebreak lands on the smallest id with no per-batch sort
    order = np.argsort(bench_ids, kind="stable")
    bench_ids, M = bench_ids[order], M[order]

    def _best(v):  # pd.Series[array<float>] -> pd.DataFrame[bench_id, sim]
        mat = np.array(
            [np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        # a zero-norm CORPUS row is just unflaggable: score it 0
        # against everything instead of poisoning the argmax with NaN
        safe = np.where(norms == 0, 1.0, norms)
        raw_sims = (mat / safe) @ M.T
        # half-away-from-zero 6-decimal quantization, matching the SQL
        # oracle's round() — np.round is banker's and disagrees on
        # exact .5e-6 boundaries (see similarity.margin_mine)
        sims = np.where(
            raw_sims >= 0,
            np.floor(raw_sims * 1e6 + 0.5),
            -np.floor(-raw_sims * 1e6 + 0.5),
        ) / 1e6
        best_pos = np.argmax(sims, axis=1)  # first max == smallest id
        rows_ix = np.arange(len(mat))
        return pd.DataFrame(
            {
                "bench_id": bench_ids[best_pos],
                "sim": sims[rows_ix, best_pos],
            }
        )

    # asNondeterministic: without it the optimizer re-evaluates the
    # benchmark matmul on both sides of a pushed filter (the committed
    # semantic_decontam plan carried two ArrowEvalPython nodes around
    # one Filter — guide §4.4); the function is pure, the marker only
    # forbids duplication.
    best = pandas_udf(
        _best, "bench_id: long, sim: double"
    ).asNondeterministic()(F.col(vec_col))
    return (
        corpus.select(F.col(id_col), best.alias("_b"))
        .select(id_col, F.col("_b.bench_id").alias("bench_id"),
                F.col("_b.sim").alias("sim"))
        .filter(F.col("sim") >= F.lit(threshold))
    )
