"""curate_documents composition: the filter ladder removes exactly
what each stage's own operator says it should, and the funnel's
arithmetic is consistent."""

from __future__ import annotations


def test_curate_documents_ladder(spark):
    from duo_spark.pipelines import curate_documents

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "to the river where it drinks the cool water in the morning"
    )
    docs = spark.createDataFrame(
        [
            (1, good),                       # survives everything
            (2, good),                       # exact dup of 1 -> dropped
            (3, good + " extra tail words here today"),  # near-dup of 1
            (4, "short"),                    # quality fail
            (5, "el la de que y " * 12),     # spanish -> language fail
            (6, good + " casino"),           # blocklist fail
            (7, "a completely different story about the sea and the "
                "ships that sail across it while the wind is in the "
                "sails and the stars guide the way home at night"),
        ],
        "doc_id long, text string",
    )
    out = curate_documents(docs, near_dup_threshold=0.5)
    kept = sorted(r.doc_id for r in out["kept"].collect())
    assert kept == [1, 7]
    funnel = {r.stage: (r.rows_in, r.rows_out, r.removed)
              for r in out["funnel"].collect()}
    assert funnel["quality"][0] == 7
    assert funnel["quality"][2] >= 1          # doc 4
    assert funnel["language"][2] == 1         # doc 5
    assert funnel["blocklist"][2] == 1        # doc 6
    assert funnel["exact_dedup"][2] == 1      # doc 2
    assert funnel["near_dedup"][2] == 1       # doc 3
    # conservation: each stage's rows_out is the next stage's rows_in
    order = ["quality", "language", "blocklist", "exact_dedup", "near_dedup"]
    for a, b in zip(order, order[1:]):
        assert funnel[a][1] == funnel[b][0]
    assert funnel["near_dedup"][1] == 2


def test_curate_documents_counts_condition_on_prior_stages(spark):
    """The round-14 single-chain-execution form derives n1-n3 from the
    checkpointed QUALITY-survivor table, so the language/blocklist
    counts must stay conditioned on the earlier stages: a doc that
    fails quality but would pass language+blocklist contributes to NO
    later stage count, and a doc failing quality AND language drops
    exactly once (at quality)."""
    from duo_spark.pipelines import curate_documents

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "to the river where it drinks the cool water in the morning"
    )
    docs = spark.createDataFrame(
        [
            (1, good),                  # survives everything
            (2, "tiny"),                # quality fail, lang would fail too
            # 3 tokens (-40) + mean token len > 12 (-20) -> score 40,
            # but 'the' still wins language id: quality-fail, lang-pass
            (3, "the aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb"),
        ],
        "doc_id long, text string",
    )
    out = curate_documents(docs)
    funnel = {r.stage: (r.rows_in, r.rows_out, r.removed)
              for r in out["funnel"].collect()}
    assert funnel["quality"] == (3, 1, 2)      # docs 2 and 3 drop HERE
    assert funnel["language"] == (1, 1, 0)     # doc 3's en does not leak in
    assert funnel["blocklist"] == (1, 1, 0)
    assert funnel["exact_dedup"] == (1, 1, 0)
    assert funnel["near_dedup"] == (1, 1, 0)
    assert sorted(r.doc_id for r in out["kept"].collect()) == [1]


def test_curate_documents_chain_keeps_cluster_representative(spark):
    """ADVICE r10 #4 guard: in a near-dup chain A~B~C with A!~C, the
    old per-pair greedy rule dropped BOTH B and C (C's only duplicate
    B was itself removed); cluster-representative removal keeps
    exactly one doc per connected component — A survives, B and C
    drop, and an unrelated doc is untouched."""
    from duo_spark.pipelines import curate_documents

    # 3-shingle Jaccard: J(a,b)=J(b,c)=90/106≈0.849 (LSH hit prob
    # ~1-1e-5 at 16 bands × 4 rows), J(a,c)=82/114≈0.719 — the exact
    # verify at threshold 0.8 deterministically keeps a~b, b~c and
    # rejects a~c even when banding happens to propose it
    words = [f"tok{i:03d}" for i in range(120)]
    a = " ".join(words[0:100])
    b = " ".join(words[8:108])
    c = " ".join(words[16:116])
    other = " ".join(f"zzz{i:02d}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, other)], "doc_id long, text string"
    )
    # neutralize the predicate stages so the test isolates stage 5
    from duo_spark.operators.text import add_lang_id

    langs = tuple(
        r.lang_guess
        for r in add_lang_id(docs, "text").select("lang_guess").distinct().collect()
    )
    out = curate_documents(
        docs, min_quality=0, langs=langs, near_dup_threshold=0.8
    )
    kept = sorted(r.doc_id for r in out["kept"].collect())
    assert kept == [1, 9]
    funnel = {r.stage: (r.rows_in, r.rows_out, r.removed)
              for r in out["funnel"].collect()}
    assert funnel["near_dedup"] == (4, 2, 2)
