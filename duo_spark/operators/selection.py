"""Importance-resampling data selection (DSIR).

Implements Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): pick
the raw-corpus documents whose hashed-n-gram distribution looks most
like a small high-quality TARGET corpus, by

1. featurizing every document into a bag of hashed word n-grams
   (unigrams + bigrams → ``buckets`` hash buckets — the paper's
   hashing trick keeps the model a fixed-size table regardless of
   vocabulary),
2. fitting two Laplace-smoothed bag-of-buckets unigram models, one on
   the target corpus and one on the raw corpus,
3. scoring each raw document with its log importance weight
   ``log p_target(doc) - log p_raw(doc)
   = Σ_gram (log p_t[bucket(gram)] - log p_r[bucket(gram)])``, and
4. resampling without replacement via Gumbel top-k: add a Gumbel(0,1)
   perturbation to each log weight and take the k largest keys —
   equivalent to sampling w/o replacement ∝ the importance weights
   (Vieira 2014; the paper's resampling step).

Spark shape, built for the 100 TB case:
- both models are ≤ ``buckets`` rows (default 1024) — they aggregate
  with map-side combine and BROADCAST to the scoring join; nothing
  model-sized ever shuffles.
- scoring is explode(grams) → broadcast-join(log-ratio) → one
  map-side-combined ``groupBy(doc).sum()`` — a single ~1-row-per-doc
  shuffle for the whole corpus.
- the top-k runs through ``orderBy().limit(k)`` which Spark executes
  as TakeOrderedAndProject (per-partition heaps + driver merge of k),
  never a global sort.

The Gumbel uniforms are md5-derived from (doc id, seed) — replayable
bit-exactly by a DuckDB oracle, same contract as
``validate.dp_noisy_counts``. A production run draws ``seed`` fresh;
the selection distribution is identical either way.

Reference parity note: the duo reference has no data-selection
surface; this extends the engine for LLM-pretraining curation
alongside operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duo_spark.operators.text import tokens

def _hash_bucket(gram: Column, buckets: int) -> Column:
    """Hash a gram string to ``[0, buckets)`` via the md5 idiom every
    oracle-replayable operator here uses (DuckDB:
    ``('0x' || substr(md5(g), 1, 13))::BIGINT % buckets``)."""
    bits = F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")
    return bits % F.lit(buckets)


def hashed_grams(text_col: str = "text", *,
                 bigrams: bool = True) -> Column:
    """Array column of the document's word unigrams (+ bigrams):
    whitespace tokens (empty tokens dropped, so blank documents
    featurize to zero grams), then adjacent pairs joined with one
    space."""
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    if not bigrams:
        return toks
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, pairs)


def hashed_bucket_counts(df: DataFrame, text_col: str = "text", *,
                         buckets: int = 1024,
                         bigrams: bool = True) -> DataFrame:
    """Corpus-wide hashed-gram bucket counts ``(bucket, cnt)`` — the
    sufficient statistic of the bag-of-buckets model. One explode +
    one map-side-combined aggregate; at most ``buckets`` rows out."""
    g = df.select(
        F.explode(hashed_grams(text_col, bigrams=bigrams)).alias("gram")
    )
    return (
        g.select(_hash_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """Per-document log importance weights ``(id_col, n_grams, score)``
    of every ``raw`` document under target-vs-raw hashed bag models.

    ``score = Σ_grams ln p̂_t[b] - ln p̂_r[b]`` with Laplace-``alpha``
    smoothing over all ``buckets`` cells (the denominators count every
    cell, so the models stay proper distributions; a bucket scoring a
    raw gram is always present in the raw count table by
    construction). Empty documents score 0 (an even-odds doc under
    both models).
    """
    t_counts = hashed_bucket_counts(target, text_col,
                                    buckets=buckets, bigrams=bigrams)
    r_counts = hashed_bucket_counts(raw, text_col,
                                    buckets=buckets, bigrams=bigrams)
    # log-ratio table: full-outer on the two ≤B-row count tables; the
    # totals are single-row aggregates crossed in (broadcast both ways).
    t_tot = t_counts.agg(F.sum("cnt").alias("t_tot"))
    r_tot = r_counts.agg(F.sum("cnt").alias("r_tot"))
    ratio = (
        t_counts.withColumnRenamed("cnt", "t_cnt")
        .join(r_counts.withColumnRenamed("cnt", "r_cnt"), "bucket", "full_outer")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(alpha))
                      / (F.coalesce(F.col("t_tot"), F.lit(0)) + F.lit(alpha * buckets)))
                - F.log((F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(alpha))
                        / (F.coalesce(F.col("r_tot"), F.lit(0)) + F.lit(alpha * buckets)))
            ).alias("log_ratio"),
        )
    )
    exploded = raw.select(
        F.col(id_col),
        F.explode_outer(hashed_grams(text_col, bigrams=bigrams)).alias("gram"),
    ).select(
        id_col,
        F.when(F.col("gram").isNotNull(),
               _hash_bucket(F.col("gram"), buckets)).alias("bucket"),
    )
    # every bucket exploded from `raw` necessarily appears in r_counts
    # (same corpus, same hash, same flags), so the ratio join can only
    # miss on the explode_outer NULL of an empty document — no
    # unseen-bucket fallback branch can ever execute
    scored = (
        exploded.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.coalesce(F.sum(F.coalesce(F.col("log_ratio"), F.lit(0.0))),
                       F.lit(0.0)).alias("score"),
        )
    )
    return scored


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    bigrams: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Gumbel top-k importance resample: the ``k`` raw documents with
    the largest ``score + Gumbel(0,1)`` keys — sampling without
    replacement proportional to the importance weights.

    Returns ``(id_col, n_grams, score, gumbel_key)`` rounded to 6
    decimals (both engines' libm ``ln`` agree far beyond that; the
    rounding pins the oracle comparison), ties broken by ``id_col``.
    SEEDED GUMBELS ARE REPLAY/TEST MODE — draw ``seed`` fresh for a
    production selection run.
    """
    from duo_spark.operators.util import md5_uniform

    scores = dsir_scores(raw, target, id_col=id_col, text_col=text_col,
                         buckets=buckets, alpha=alpha, bigrams=bigrams)
    gumbel = -F.log(-F.log(md5_uniform(id_col, seed, "gumbel")))
    keyed = scores.select(
        id_col,
        "n_grams",
        F.round(F.col("score"), 6).alias("score"),
        F.round(F.col("score") + gumbel, 6).alias("gumbel_key"),
    )
    # TakeOrderedAndProject: per-partition k-heaps, driver merge of k.
    return keyed.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(k)


def doremi_weights(
    df: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss",
    ref_loss_col: str | None = None,
    *,
    eta: float = 1.0,
    steps: int = 10,
    smoothing: float = 1e-3,
) -> DataFrame:
    """Domain-mixture reweighting in the DoReMi shape (Xie et al.
    2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): per-domain EXCESS loss (clipped at 0) drives
    multiplicative-weights updates, and the released mixture is the
    step-AVERAGED softmax blended with uniform — upweighting the
    domains a proxy model finds reducible-but-unreduced.

    This batch analog takes the per-document proxy loss as a COLUMN
    (the paper trains a proxy LM online; here any scorer the repo
    already gates works — the gate feeds ``bigram_lm``).
    ``ref_loss_col`` supplies the per-document reference loss; when
    None the reference is the corpus-wide mean loss, so excess_i =
    max(0, mean_i − global_mean). With a static excess the DoReMi
    trajectory is closed-form per step t — α_t = softmax(η·t·excess)
    from a uniform α₀ — and the released weight is the average over
    ``steps`` of those softmaxes, then ``(1−smoothing)·ᾱ +
    smoothing/k`` (the paper's uniform smoothing).

    Scale shape: ONE map-side-combined aggregate to |domains| rows;
    the update trajectory is solved DRIVER-side over that bounded
    table (same class as tune_lsh_bands' S-curve solver — never a
    per-document iteration). NULL domains form their own group; docs
    with NULL loss don't score (mean/count ignore them).

    Returns ``(domain_col, n_docs, mean_loss, excess, weight)``
    rounded to 6 dp, weights summing to ~1.
    """
    import math

    excess_src = (
        F.col(loss_col) - F.col(ref_loss_col)
        if ref_loss_col
        else F.col(loss_col)
    )
    per = (
        df.groupBy(domain_col)
        .agg(
            F.count(loss_col).alias("n_docs"),
            F.avg(loss_col).alias("mean_loss"),
            F.avg(excess_src).alias("_mean_excess_src"),
        )
        .collect()
    )
    if not per:
        raise ValueError("doremi_weights: empty input")
    if ref_loss_col:
        base = {r[0]: float(r["_mean_excess_src"] or 0.0) for r in per}
    else:
        tot_n = sum(r["n_docs"] for r in per)
        tot = sum(
            (r["mean_loss"] or 0.0) * r["n_docs"] for r in per
        )
        gmean = tot / tot_n if tot_n else 0.0
        base = {
            r[0]: (float(r["mean_loss"]) - gmean)
            if r["mean_loss"] is not None
            else 0.0
            for r in per
        }
    domains = [r[0] for r in per]
    excess = {d: max(0.0, base[d]) for d in domains}
    k = len(domains)
    # Match the SQL-oracle operation order exactly: per domain, SUM the
    # per-step softmax shares first, then divide by ``steps`` ONCE
    # (sum(ew/z)/steps), instead of accumulating e/z/steps per step —
    # the different float summation order could flip a last-ulp 6-dp
    # comparison (round-12 ADVICE).
    share_sum = {d: 0.0 for d in domains}
    for t in range(1, steps + 1):
        ex = [math.exp(eta * t * excess[d]) for d in domains]
        z = sum(ex)
        for d, e in zip(domains, ex):
            share_sum[d] += e / z
    avg = {d: share_sum[d] / steps for d in domains}
    weight = {d: (1.0 - smoothing) * avg[d] + smoothing / k for d in domains}
    rows = [
        (
            r[0],
            int(r["n_docs"]),
            float(r["mean_loss"]) if r["mean_loss"] is not None else None,
            excess[r[0]],
            weight[r[0]],
        )
        for r in per
    ]
    schema = (
        df.select(domain_col).schema[0].dataType.simpleString()
    )
    out = df.sparkSession.createDataFrame(
        rows,
        f"{domain_col} {schema}, n_docs long, mean_loss double, "
        "excess double, weight double",
    )
    # Engine-side HALF_UP rounding (ties away from zero), the same tie
    # rule DuckDB's round() uses — Python round() is banker's and can
    # disagree on exact .5 ties (round-12 ADVICE).
    return out.select(
        domain_col,
        "n_docs",
        F.round("mean_loss", 6).alias("mean_loss"),
        F.round("excess", 6).alias("excess"),
        F.round("weight", 6).alias("weight"),
    )
