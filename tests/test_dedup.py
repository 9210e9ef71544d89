"""Dedup operator semantics: SimHash exactness, MinHash recall bound,
ngram df-cutoff behavior (VERDICT r1 items #6/#7/#9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duo_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_simhash_banded_equals_bruteforce(spark, docs):
    """(max_hamming+1)-block banding must find EXACTLY the pairs within
    hamming distance — pigeonhole guarantees recall, the filter gives
    precision."""
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).collect()
    }
    sigs = dedup.with_simhash(docs.select("doc_id", "text"), "text", "_sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
        ).collect()
    }
    assert banded == brute
    assert brute, "fixture should contain at least one near-dup pair"


def test_simhash_column_matches_dataframe_form(spark, docs):
    sample = docs.limit(50)
    via_df = {
        r.doc_id: r.sig
        for r in dedup.with_simhash(sample, "text", "sig").select("doc_id", "sig").collect()
    }
    via_col = {
        r.doc_id: r.sig
        for r in sample.select("doc_id", dedup.simhash_signature("text").alias("sig")).collect()
    }
    assert via_df == via_col


def test_minhash_pairs_subset_of_exact_with_full_recall_on_strong_pairs(spark, docs):
    """Precision is 1 by construction (exact-Jaccard verify); recall
    must be 1 for comfortably-above-threshold pairs (>=0.8 jaccard has
    band-miss probability < 1e-9 with 16 bands x 4 rows)."""
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5).collect()
    }
    sh = docs.select(F.col("doc_id").alias("_id"), dedup.shingles("text", 3).alias("_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                (
                    F.size(F.array_intersect("a._sh", "b._sh"))
                    / F.size(F.array_union("a._sh", "b._sh"))
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.5)
        ).collect()
    }
    assert set(got) <= set(exact)
    strong = {p for p, j in exact.items() if j >= 0.8}
    assert strong <= set(got)
    for p in got:
        assert abs(got[p] - exact[p]) < 1e-9


def test_ngram_df_cutoff_inert_when_loose(spark, docs):
    """A cutoff above every shingle's document frequency must reproduce
    the exhaustive result exactly."""
    n_docs = docs.count()
    base = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.75).collect()
    }
    cut = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.75, max_doc_freq=n_docs
        ).collect()
    }
    assert base == cut


def test_ngram_df_cutoff_bounds_fanout_on_pathological_tokens(spark):
    """A token shared by every document ("the") must not reach the
    index join when the cutoff is active; near-dup pairs sharing rare
    tokens must still be found with EXACT jaccard values."""
    rows = [(i, f"the unique{i} token{i} the common") for i in range(40)]
    rows += [(100, "the alpha beta gamma delta"), (101, "the alpha beta gamma epsilon")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, max_doc_freq=5
        ).collect()
    }
    # alpha/beta/gamma/delta-epsilon pair: jaccard = 4/6 (exact, from
    # the FULL shingle sets even though 'the' was cut from the index)
    assert (100, 101) in got
    assert abs(got[(100, 101)] - 4 / 6) < 1e-9
    # the 40 filler docs share only 'the' and 'common' — 'the'+'common'
    # both exceed df<=5, so no candidate pairs among them survive
    assert all(p == (100, 101) for p in got)

    # and the index itself is bounded: explode + df-filter leaves only
    # sub-threshold tokens
    sh = df.select(F.col("doc_id").alias("_id"), dedup.shingles("text", 1).alias("_sh"))
    tok = sh.select("_id", F.explode("_sh").alias("_t"))
    dfreq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("n"))
    assert dfreq.filter(F.col("n") > 5).count() >= 2  # 'the', 'common' would explode


def test_simhash_giant_doc_no_ansi_overflow(spark):
    """Docs beyond the 32,767-distinct-word cap must not raise an ANSI
    ARITHMETIC_OVERFLOW (top SWAR lane hitting the sign bit); they are
    deterministically truncated to the first 32,767 distinct words."""
    big = " ".join(f"w{i}" for i in range(40_000))
    capped = " ".join(f"w{i}" for i in range(32_767))
    df = spark.createDataFrame([(1, big), (2, capped)], "doc_id: long, text: string")
    rows = {r.doc_id: r.sig for r in dedup.with_simhash(df, "text", "sig").collect()}
    assert rows[1] == rows[2], "truncated giant doc must hash like its first 32,767 words"


# ------------------------------------------------- substring dedup (r4)


def _sub_docs(spark):
    """Two docs sharing a verbatim 10-token run (cross-doc dup), a doc
    whose only repetition is INTERNAL (must not count), a short doc
    (< window tokens), and an unrelated doc."""
    shared = "the quick brown fox jumps over the lazy sleeping dog"  # 10 tokens
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"{shared} zeta eta theta iota kappa"),
        (3, "self self self self self self self self self self"),
        (4, "tiny doc"),
        (5, "completely different words that appear exactly once here today"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_duplicated_spans_cross_doc_only(spark):
    spans = dedup.duplicated_spans(_sub_docs(spark), window=8)
    got = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in spans.collect()}
    # doc 1: shared run is tokens 2..11; windows starting 2,3,4 dup -> span [2, 11]
    # doc 2: tokens 0..9; windows 0,1,2 -> span [0, 9]
    assert got == {1: (2, 11), 2: (0, 9)}
    # internal-only repetition (doc 3: its windows are identical to each
    # other but exist in no OTHER doc) and short docs produce nothing


def test_substring_dedup_stats_values(spark):
    stats = {r["doc_id"]: r for r in dedup.substring_dedup_stats(_sub_docs(spark), window=8).collect()}
    assert set(stats) == {1, 2}
    assert stats[1]["n_tokens"] == 14 and stats[1]["dup_tokens"] == 10
    assert stats[2]["n_tokens"] == 15 and stats[2]["dup_tokens"] == 10
    assert stats[1]["dup_spans"] == 1
    assert abs(stats[1]["dup_ratio"] - 10 / 14) < 1e-6


def test_substring_dedup_hash_invariant(spark, docs):
    """Span results are hash-choice-invariant on the fixture corpus:
    xxhash64 (production) and md5-long (oracle gate) flag identical
    (doc, span) sets."""
    a = sorted(map(tuple, dedup.duplicated_spans(docs, window=8).collect()))
    b = sorted(map(tuple, dedup.duplicated_spans(
        docs, window=8, window_hash=dedup.md5_word_hash).collect()))
    assert a == b and len(a) > 0


def test_duplicated_windows_methods_agree(spark, docs):
    """The one-pass min/max window plan (default) and the skew-safe
    agg+semijoin plan must flag identical (doc, pos) sets."""
    a = sorted(map(tuple, dedup.duplicated_windows(docs, method="window").collect()))
    b = sorted(map(tuple, dedup.duplicated_windows(docs, method="agg").collect()))
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="method"):
        dedup.duplicated_windows(docs, method="bogus")


def test_duplicated_spans_merges_disjoint_runs(spark):
    """Two separate shared runs in one doc yield two spans, not one."""
    run1 = "one two three four five six seven eight"        # 8 tokens
    run2 = "red orange yellow green blue indigo violet pink"  # 8 tokens
    rows = [
        (1, f"{run1} xxa xxb xxc {run2}"),
        (2, f"{run1} qqa qqb qqc qqd qqe"),
        (3, f"ppa ppb ppc ppd ppe {run2}"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    spans = dedup.duplicated_spans(df, window=8)
    got = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect())
    assert got == [(1, 0, 7), (1, 11, 18), (2, 0, 7), (3, 5, 12)]


def test_incremental_matches_full_restricted(spark, docs):
    """Index + incremental probe must find exactly the full-corpus
    near-dup pairs that touch the new batch (old↔old pairs excluded
    by construction, not by filtering)."""
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    bands_df, sets_df = dedup.minhash_index(corpus, "doc_id", "text")
    inc = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in dedup.incremental_near_duplicates(
            bands_df, sets_df, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in dedup.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
        if r.id_a % 3 == 0 or r.id_b % 3 == 0
    }
    assert inc == full and len(inc) > 0


def test_incremental_index_roundtrips_parquet(spark, docs, tmp_path):
    """The index is persistable: write/read through parquet and probe
    the reloaded copy — identical pairs."""
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    bands_df, sets_df = dedup.minhash_index(corpus, "doc_id", "text")
    bands_df.write.parquet(str(tmp_path / "bands"))
    sets_df.write.parquet(str(tmp_path / "sets"))
    direct = dedup.incremental_near_duplicates(
        bands_df, sets_df, batch, "doc_id", "text", threshold=0.5)
    reloaded = dedup.incremental_near_duplicates(
        spark.read.parquet(str(tmp_path / "bands")),
        spark.read.parquet(str(tmp_path / "sets")),
        batch, "doc_id", "text", threshold=0.5)
    a = sorted((r.id_a, r.id_b, round(r.jaccard, 6)) for r in direct.collect())
    b = sorted((r.id_a, r.id_b, round(r.jaccard, 6)) for r in reloaded.collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------
# select_canonical (round 5): quality-winner collapse of dup clusters
# ---------------------------------------------------------------------

def test_select_canonical_quality_winner(spark):
    from pyspark.sql import functions as F
    from duo_spark.operators.dedup import select_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (5, 7), (6, 7)],
        "doc_id long, n_chars long",
    )
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in select_canonical(clusters, docs).collect()}
    # cluster 1: docs 2 and 3 tie on n_chars=99 -> lowest id (2) wins
    # cluster 4: singleton keeps itself
    # cluster 5: docs 5,6 tie at 7 -> doc 5 wins
    assert got == {1: (1, False), 2: (1, True), 3: (1, False),
                   4: (4, True), 5: (5, True), 6: (5, False)}
    assert sum(keep for _, keep in got.values()) == 3


# ---------------------------------------------------------------------
# containment_pairs (round 5): asymmetric near-dup
# ---------------------------------------------------------------------

def _naive_containment(rows, t, n=3):
    def sh(text):
        w = text.split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i+n]) for i in range(len(w) - n + 1)}
    sets = {i: sh(tx) for i, tx in rows}
    out = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            if len(sa) < len(sb) or (len(sa) == len(sb) and a < b):
                c = len(sa & sb) / len(sa)
                if c >= t:
                    out[(a, b)] = round(c, 6)
    return out


def test_containment_pairs_matches_naive(spark):
    import random
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        base = rng.choices(vocab, k=rng.randint(6, 30))
        rows.append((i, " ".join(base)))
        if i % 4 == 0:  # mostly-contained fragment: prefix + a foreign tail
            frag = base[: max(5, len(base) * 3 // 4)] + [f"alien{i}"]
            rows.append((100 + i, " ".join(frag)))
        if i % 7 == 0:  # identical twin
            rows.append((200 + i, " ".join(base)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from duo_spark.operators.dedup import containment_pairs

    got = {(r.id_a, r.id_b): round(r.containment, 6)
           for r in containment_pairs(df, "doc_id", "text", threshold=0.8).collect()}
    want = _naive_containment(rows, 0.8)
    assert got == want
    assert any(c < 1.0 for c in want.values())     # real partial containments
    assert any(c == 1.0 for c in want.values())    # and exact/subset ones


def test_containment_asymmetric_case_jaccard_misses(spark):
    """A short doc fully inside a long one: containment 1.0 even
    though Jaccard is tiny — the case this operator exists for."""
    long = " ".join(f"tok{i}" for i in range(60))
    short = " ".join(f"tok{i}" for i in range(10, 20))
    df = spark.createDataFrame([(1, long), (2, short)], "doc_id long, text string")
    from duo_spark.operators.dedup import containment_pairs, minhash_near_duplicates

    got = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, "doc_id", "text", threshold=0.9).collect()}
    assert got == {(2, 1): 1.0}
    assert minhash_near_duplicates(df, "doc_id", "text", threshold=0.9).count() == 0


def test_containment_exact_boundary_prefix(spark):
    """Regression: C exactly at the threshold with the MISSING token
    being A's smallest hash — the float-arithmetic prefix (floor((1-t)
    *|A|)+1) posted one hash too few and silently dropped the pair."""
    from duo_spark.operators.dedup import containment_pairs
    from pyspark.sql import functions as F

    # find 5 single-word shingles where the smallest xxhash64 is known
    words = [f"w{i}" for i in range(5)]
    hashes = {
        r.w: r.h
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.xxhash64(F.col("w")).alias("h")).collect()
    }
    smallest = min(words, key=lambda w: hashes[w])
    rest = [w for w in words if w != smallest]
    # A = 5 shingles incl. the smallest-hash one; B ⊇ A minus that one
    a_text = " ".join(words)
    b_text = " ".join(rest + [f"extra{i}" for i in range(30)])
    df = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string")
    got = {(r.id_a, r.id_b): round(r.containment, 6)
           for r in containment_pairs(
               df, "doc_id", "text", threshold=0.8, shingle_n=1).collect()}
    assert got == {(1, 2): 0.8}


def test_select_canonical_double_quality(spark):
    """Regression: a double quality column must NOT be truncated to
    long (0.95 vs 0.87 both became 0 → min-id won instead)."""
    from duo_spark.operators.dedup import select_canonical

    clusters = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    docs = spark.createDataFrame([(1, 0.87), (2, 0.95)], "doc_id long, q double")
    got = {r.doc_id: r.keep
           for r in select_canonical(clusters, docs, quality_col="q").collect()}
    assert got == {1: False, 2: True}


# ---------------------------------------------------------------------
# round 7: winnowing fingerprints (operators/text.py)
# ---------------------------------------------------------------------

def test_winnowing_local_match_guarantee(spark):
    """Schleimer et al.'s guarantee: two docs sharing a run of at
    least w + k - 1 words select at least one COMMON fingerprint,
    regardless of where the run sits in either document."""
    import random

    from duo_spark.operators.text import winnowing_fingerprints

    k, w = 4, 5
    rng = random.Random(13)
    shared = " ".join(f"s{i}" for i in range(w + k - 1))  # exactly w+k-1 words
    def noise(n, tag):
        return " ".join(f"{tag}{rng.randint(0, 999)}" for _ in range(n))
    rows = [
        (1, noise(30, "a") + " " + shared + " " + noise(7, "b")),
        (2, shared + " " + noise(40, "c")),
        (3, noise(35, "d")),  # no shared run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(df, "doc_id", "text", k=k, w=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared run must select a common fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_short_text(spark):
    from duo_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))),  # all-distinct grams
         (2, "one two"),                               # shorter than k
         (3, "x " * 200)],                             # fully repetitive
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, "doc_id", "text", k=4, w=5)
    counts = {r.doc_id: r.n for r in
              fps.groupBy("doc_id").agg(__import__("pyspark").sql.functions.count(
                  __import__("pyspark").sql.functions.lit(1)).alias("n")).collect()}
    # density ~ 2/(w+1) of 97 grams ≈ 32; sliding minima select between
    # 1/w and ~2/(w+1) on random-ish hashes
    assert 15 <= counts[1] <= 50
    assert counts[2] == 1      # whole-text fingerprint
    assert counts[3] == 1      # one distinct gram -> one fingerprint


# property: the exact-dedup key normalizer is idempotent
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_normalize_text_idempotent(spark, texts):
    """normalize(normalize(t)) == normalize(t) for arbitrary unicode —
    the property that makes the exact-dedup content hash stable no
    matter how many pipeline stages re-normalize (the same class of
    bug the URL canonicalizer's single-strip slash rule had)."""
    from pyspark.sql import functions as F

    from duo_spark.operators.dedup import normalize_text

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    bad = df.select(
        normalize_text(F.col("t")).alias("c1"),
        normalize_text(normalize_text(F.col("t"))).alias("c2"),
    ).filter(F.col("c1") != F.col("c2"))
    assert bad.count() == 0


def test_hot_bucket_cap_drops_quadratic_bucket(spark):
    """VERDICT r12 #3 + ADVICE r13: B rows with IDENTICAL shingle sets
    land in the same (band, bucket) in EVERY band — the worst-case hot
    bucket. With max_bucket_size < B the bucket leaves the quadratic
    self-join and emits an id-sorted LADDER — adjacent links (i, i+1)
    plus stride-2 links (i, i+2), 2B-3 pairs — so connectivity for
    downstream clustering survives any single link failing exact-
    Jaccard verification; without the cap the same input emits the
    full B*(B-1)/2 pair set into one partition."""
    from pyspark.sql import functions as F

    from duo_spark.operators.dedup import _banded_set_candidates

    B = 12
    sh = spark.createDataFrame(
        [(i, [10, 20, 30, 40, 50]) for i in range(B)],
        "_id long, _hs array<long>",
    )
    uncapped = _banded_set_candidates(sh, 16, 4, max_bucket_size=None)
    assert uncapped.count() == B * (B - 1) // 2
    capped = _banded_set_candidates(sh, 16, 4, max_bucket_size=B - 1)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    ladder = {(i, i + 1) for i in range(B - 1)} | {(i, i + 2) for i in range(B - 2)}
    assert got == ladder
    # a cap the bucket fits under is a no-op
    roomy = _banded_set_candidates(sh, 16, 4, max_bucket_size=B)
    assert roomy.count() == B * (B - 1) // 2


def test_hot_bucket_ladder_survives_one_bad_link(spark):
    """The stride-2 rungs are the verify-aware fallback: drop any ONE
    adjacent link from the ladder and the remaining pairs still
    connect the whole bucket (single-failure tolerance the plain
    chain lacked)."""
    from duo_spark.operators.dedup import _banded_set_candidates

    B = 8
    sh = spark.createDataFrame(
        [(i, [10, 20, 30, 40, 50]) for i in range(B)],
        "_id long, _hs array<long>",
    )
    got = {
        (r.id_a, r.id_b)
        for r in _banded_set_candidates(sh, 16, 4, max_bucket_size=B - 1).collect()
    }

    def components(pairs):
        parent = list(range(B))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(i) for i in range(B)})

    assert components(got) == 1
    for drop in [(i, i + 1) for i in range(B - 1)]:
        assert components(got - {drop}) == 1, f"link {drop} is a single point of failure"


def test_hot_bucket_cap_inert_on_normal_corpus(spark):
    """The default cap must not change results on a corpus with no hot
    bucket — and identical-set families still surface through the
    intra-group (collapse) path even under an aggressive cap."""
    from duo_spark.operators.dedup import minhash_near_duplicates

    docs = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)]
    docs += [(10 + i, f"totally different text number {i} with words {i*7}")
             for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {(r.id_a, r.id_b) for r in
            minhash_near_duplicates(df, "doc_id", "text", threshold=0.5,
                                    max_bucket_size=None).collect()}
    # identical family of 4 -> 6 intra pairs
    assert {(a, b) for a, b in base if a < 4} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    capped = {(r.id_a, r.id_b) for r in
              minhash_near_duplicates(df, "doc_id", "text", threshold=0.5,
                                      max_bucket_size=1).collect()}
    # cap=1 kills every cross-set band bucket, but the intra path is
    # collapse-driven, not band-driven: the identical family survives
    assert {(a, b) for a, b in capped if a < 4} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert capped <= base
