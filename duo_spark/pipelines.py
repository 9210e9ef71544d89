"""End-to-end corpus-curation composition (round 10).

One call chains the quality → language → blocklist → exact-dedup →
near-dedup filter ladder every pre-training pipeline runs (the C4 /
Gopher / RefinedWeb recipe), entirely from operators that already
exist and are individually gate-verified. The value added here is
the COMPOSITION contract:

- every stage is a lazy DataFrame transformation — one program, one
  Catalyst plan per output, no intermediate materialization the
  caller didn't ask for;
- the survivors table and the per-stage attrition funnel come back
  together, so the dataset card's "rows removed by stage" table is
  one aggregation away;
- stage thresholds are keyword-only parameters with the repo's
  gate-verified defaults.

Scale: the heavy stage (near-dup) is the banded MinHash-LSH path
(`operators/dedup.py`), never all-pairs; the cheap stages are pure
Column projections that ride the scan. The funnel report runs one
count per stage boundary — O(stages) jobs, each a map-side-combined
count over a column-pruned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duo_spark.operators import dedup as _dedup
from duo_spark.operators import text as _text


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: int = 60,
    langs: tuple[str, ...] = ("en",),
    blocklist: tuple[str, ...] = _text.DEFAULT_BLOCKLIST,
    near_dup_threshold: float = 0.7,
) -> dict[str, DataFrame]:
    """The standard curation ladder over a documents table.

    Stages, in pipeline order (each consumes the previous survivors):

    1. ``quality``: heuristic 0-100 score >= ``min_quality``
       (:func:`duo_spark.operators.text.quality_score`);
    2. ``language``: marker-based lang-id in ``langs``
       (:func:`duo_spark.operators.text.add_lang_id`);
    3. ``blocklist``: zero whole-token blocklist hits
       (:func:`duo_spark.operators.text.blocklist_match`);
    4. ``exact_dedup``: one survivor (min id) per normalized text
       (:func:`duo_spark.operators.dedup.exact_duplicates` semantics);
    5. ``near_dedup``: banded MinHash-LSH pairs at
       ``near_dup_threshold``; within each duplicate PAIR the larger
       id drops (transitively: any doc that is the larger id of some
       surviving smaller near-duplicate is removed).

    Returns ``{"kept": survivors, "funnel": (stage, rows_in,
    rows_out, removed)}``. ``kept`` is lazy; ``funnel`` is computed
    EAGERLY (one counting job per stage boundary, each a map-side
    count over a column-pruned sub-plan) because attrition numbers
    are the point of asking for it.
    """
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    q = _text.quality_score(docs, text_col)
    s1 = q.filter(F.col("quality_score") >= min_quality).select(docs.columns)
    stages.append(("quality", s1))

    s2 = (
        _text.add_lang_id(s1, text_col)
        .filter(F.col("lang_guess").isin(list(langs)))
        .select(docs.columns)
    )
    stages.append(("language", s2))

    hits = _text.blocklist_match(s2, id_col, text_col, blocklist)
    s3 = s2.join(
        hits.filter(~F.col("blocked")).select(id_col), id_col, "left_semi"
    )
    stages.append(("blocklist", s3))

    norm = _dedup.normalize_text(F.col(text_col))
    winners = (
        s3.groupBy(norm.alias("_norm"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    s4 = s3.join(winners, id_col, "left_semi")
    stages.append(("exact_dedup", s4))

    pairs = _dedup.minhash_near_duplicates(
        s4, id_col, text_col, threshold=near_dup_threshold
    )
    losers = pairs.select(
        F.greatest(F.col("id_a"), F.col("id_b")).alias(id_col)
    ).distinct()
    s5 = s4.join(losers, id_col, "left_anti")
    stages.append(("near_dedup", s5))

    sess = docs.sparkSession
    counts = [(name, df.count()) for name, df in stages]  # one job each
    funnel_rows = [
        (name, n_in, n_out, n_in - n_out)
        for (_, n_in), (name, n_out) in zip(counts, counts[1:])
    ]
    funnel = sess.createDataFrame(
        funnel_rows, "stage string, rows_in long, rows_out long, removed long"
    )
    return {"kept": stages[-1][1], "funnel": funnel}
