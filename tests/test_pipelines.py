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
