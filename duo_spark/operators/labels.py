"""Annotation aggregation — majority-vote label resolution and
inter-annotator agreement.

A labeling pipeline (human raters or LLM judges) produces several
(item, rater, label) votes per item; training wants ONE label per
item plus a quality signal for how contested it was, and the dataset
card wants a corpus-level agreement statistic. Both are classic
multi-rater constructs (Fleiss 1971, "Measuring nominal scale
agreement among many raters").

Scale shape: everything is two hash aggregates with map-side partials
— (item, label) vote counts (shuffle carries distinct votes, not
ratings), then one max_by per item. The kappa reduces the SAME vote
table to a handful of exact integer sums; no windows, no driver
state. All tie-breaks are total (count desc, label asc) so results
are deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vote_counts(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """(item, label, votes) — the shared reduction. One aggregate;
    NULL labels are abstentions and dropped."""
    return (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(item_col, label_col)
        .agg(F.count(F.lit(1)).alias("votes"))
    )


def resolve_labels(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Majority label per item with a deterministic tie-break (most
    votes, then lexicographically smallest label) plus the per-item
    agreement signal a curriculum or filtering stage keys on:

    ``(item, label, n_votes, top_votes, agreement)`` where
    ``agreement = top_votes / n_votes`` (1.0 = unanimous), rounded to
    6 dp — one IEEE divide over exact integer counts.
    """
    counts = vote_counts(df, item_col, label_col)
    # min_by over (-votes, label): votes DESC then label ASC — one
    # hash aggregate, no window
    pick = F.min_by(
        F.struct(F.col(label_col).alias("_l"), F.col("votes").alias("_v")),
        F.struct((-F.col("votes")).alias("_nv"), F.col(label_col).alias("_l")),
    )
    per_item = counts.groupBy(item_col).agg(
        pick.alias("_pick"),
        F.sum("votes").alias("n_votes"),
    )
    return per_item.select(
        item_col,
        F.col("_pick._l").alias(label_col),
        "n_votes",
        F.col("_pick._v").alias("top_votes"),
        F.round(
            F.col("_pick._v").cast("double") / F.col("n_votes").cast("double"),
            6,
        ).alias("agreement"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """One-row Fleiss' kappa over a multi-rater vote table (items may
    have unequal rating counts — the pairwise-agreement formulation):

    - p_o: mean over items (with ≥2 ratings) of the fraction of
      agreeing rater PAIRS, Σ_l c_il·(c_il−1) / (n_i·(n_i−1));
    - p_e: Σ_l (global share of label l)²;
    - kappa = (p_o − p_e) / (1 − p_e).

    Exact integer pair counts; three IEEE divides at the end, 6 dp —
    bit-reproducible in any engine. Output: ``(n_items, n_ratings,
    p_o, p_e, kappa)``.
    """
    counts = vote_counts(df, item_col, label_col)
    per_item = counts.groupBy(item_col).agg(
        F.sum("votes").alias("_n"),
        F.sum(F.col("votes") * (F.col("votes") - 1)).alias("_agree_pairs"),
    )
    multi = per_item.filter(F.col("_n") >= 2)
    po = multi.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_n").alias("n_ratings"),
        F.avg(
            F.col("_agree_pairs").cast("double")
            / (F.col("_n") * (F.col("_n") - 1)).cast("double")
        ).alias("_po"),
    )
    # global label shares over the SAME >=2-rating item set
    shares = (
        counts.join(multi.select(item_col), item_col)
        .groupBy(label_col)
        .agg(F.sum("votes").alias("_v"))
    )
    pe = shares.agg(
        (
            F.sum(F.col("_v").cast("double") * F.col("_v").cast("double"))
            / (F.sum("_v").cast("double") * F.sum("_v").cast("double"))
        ).alias("_pe")
    )
    # degenerate corpus: one label everywhere -> p_e == 1 and the
    # formula divides by zero; p_o is necessarily 1 too, and the
    # convention is kappa = 1 (perfect agreement, however trivial)
    kappa = F.when(F.col("_pe") >= 1.0, F.lit(1.0)).otherwise(
        (F.col("_po") - F.col("_pe")) / (F.lit(1.0) - F.col("_pe"))
    )
    return po.crossJoin(pe).select(
        "n_items",
        "n_ratings",
        F.round("_po", 6).alias("p_o"),
        F.round("_pe", 6).alias("p_e"),
        F.round(kappa, 6).alias("kappa"),
    )
