"""BM25 full-text search over a document corpus.

A training-data pipeline needs lexical retrieval next to the embedding
path (operators/similarity.py): targeted corpus probes ("find documents
about X"), decontamination sweeps (find benchmark passages in the
training set), and hybrid dedup all start with a term query against
100 TB of text. The reference has no search surface (its text querying
is the logs ILIKE fallback, duo/src/web/logs.rs:54) — this is a
north-star extension built Spark-first.

Shape, and why it scales:
- tokenize → explode → filter to the query's terms FIRST: every
  aggregate downstream is over documents-that-contain-a-query-term,
  not the corpus. The explode never shuffles pre-filter rows.
- per-(doc,term) term frequencies and per-term document frequencies
  are two hash aggregates on that filtered set (map-side combined).
- corpus stats (N, avgdl) are a one-row aggregate over a projection
  (no explode — dl is just size(tokens)); joined via broadcast.
- the per-term document-frequency table is at most |query| rows —
  broadcast. Scoring is a projection; top-k is TakeOrderedAndProject.

Everything is built-in Column algebra (JVM codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def search_tokens(col: Column | str) -> Column:
    """Lowercase alphanumeric terms — deliberately SQL-replicable
    (DuckDB regexp_extract_all) so BM25 results are oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id_col, score) for every document matching ≥1 query term.

    Uses the non-negative BM25 idf (Lucene form):
        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        w(d,t)  = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score   = Σ_t w(d,t)
    """
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col).alias("_id"), search_tokens(text_col).alias("_ts")
    )
    # corpus stats from a projection (dl needs no explode)
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size("_ts")).alias("_avgdl"),
    )
    hits = (
        toks.select("_id", F.size("_ts").alias("_dl"), F.explode("_ts").alias("_t"))
        .filter(F.col("_t").isin(terms))
    )
    tf = hits.groupBy("_id", "_t").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"), F.first("_dl").alias("_dl")
    )
    dft = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("double").alias("_dft"))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_dft") + 0.5) / (F.col("_dft") + 0.5))
    norm = F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    w = idf * F.col("_tf") * (k1 + 1) / norm
    return (
        tf.join(F.broadcast(dft), "_t")
        .join(F.broadcast(stats))
        .select("_id", w.alias("_w"))
        .groupBy("_id")
        .agg(F.sum("_w").alias("score"))
        .select(F.col("_id").alias(id_col), "score")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by (score desc, id asc) — total order, plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    scored = bm25_scores(df, query_terms, id_col, text_col, k1, b)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 3,
) -> DataFrame:
    """Per-document top TF-IDF terms — the cheap keyword-extraction /
    topic-fingerprint pass of a corpus analysis pipeline.

        score(d, t) = tf(d, t) * ln(N / df_t)

    Rank is per document by (rounded score desc, term asc): ranking on
    the 6-decimal rounding keeps the cut deterministic across engines
    (the same policy as bm25's gate query — raw ln() can differ in the
    last ulp between libm implementations).

    Scale: tf is one (doc, term) shuffle with map-side combine; df_t is
    a term-keyed aggregate of tf joined back on term (big-big equi-join
    — the term table is NOT assumed broadcastable, same stance as
    text.unigram_lm_score); the per-document window partitions by doc
    id, so no global sort exists.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(search_tokens(text_col)).alias("_t")
    )
    tf = toks.groupBy("_id", "_t").agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    dft = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("double").alias("_dft"))
    n_docs = df.select(F.countDistinct(id_col).cast("double").alias("_n"))
    scored = (
        tf.join(dft, "_t")
        .join(F.broadcast(n_docs))
        .select(
            "_id",
            "_t",
            F.round(F.col("_tf") * F.log(F.col("_n") / F.col("_dft")), 6).alias(
                "score"
            ),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("_t"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= top)
        .select(
            F.col("_id").alias(id_col),
            F.col("_t").alias("term"),
            "score",
            "rank",
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked candidate lists:
    fused(d) = Σ_lists 1/(k + rank_d) — the standard score-free way to
    merge heterogeneous retrievers (BM25 ⊕ ANN ⊕ quality priors),
    robust to incomparable score scales.

    Inputs are (id, score) DataFrames that MUST already be truncated
    to bounded candidate lists (top-N per retriever) — ranks come from
    a global sort, which is only sane on a bounded list; fusing whole
    corpora is a misuse (rank the corpus with the retrievers, fuse
    their top-N). Ranks are 1-based by (score desc, id asc), so ties
    are deterministic; ids absent from one list simply contribute
    nothing from it (the union-of-lists RRF convention).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def ranked(df: DataFrame, name: str) -> DataFrame:
        # constant-but-unfoldable partition key (pmod(id,1) ≡ 0):
        # semantically the same single-partition rank (inputs are
        # bounded lists by contract) without tripping WindowExec's
        # missing-partition warning on every batch — a literal would be
        # constant-folded out of the partition spec
        w = Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        return df.select(
            F.col(id_col), F.row_number().over(w).alias(name)
        )
    a = ranked(ranked_a, "_ra")
    b = ranked(ranked_b, "_rb")
    fused = (
        a.join(b, id_col, "full")
        .select(
            id_col,
            (
                F.coalesce(1.0 / (F.lit(k) + F.col("_ra")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("_rb")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    return fused
