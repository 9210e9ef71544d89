"""Round-7 late additions: HLL sketch (mergeability + accuracy),
triangle counting vs brute force, rolling z-score vs a hand
computation, and BPE merge semantics vs a reference implementation
of the greedy merge rule."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F

from duo_spark.operators.anomaly import rolling_zscore, top_anomalies
from duo_spark.operators.bpe import bpe_train, merge_pair, word_freq_table
from duo_spark.operators.graph import triangle_count
from duo_spark.operators.sketch import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


# --- HLL ---------------------------------------------------------------


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_hll_merge_equals_sketch_of_union(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property
    incremental distinct rollups rely on."""
    rng = random.Random(7)
    a = [("x", rng.randrange(10_000)) for _ in range(3_000)]
    b = [("x", rng.randrange(10_000)) for _ in range(3_000)]
    sa = hll_sketch(_vals(spark, a), ["g"], "v")
    sb = hll_sketch(_vals(spark, b), ["g"], "v")
    su = hll_sketch(_vals(spark, a + b), ["g"], "v")
    merged = hll_merge(sa, sb, group_cols=["g"])
    got = {(r["g"], r["bucket"]): r["register"] for r in merged.collect()}
    want = {(r["g"], r["bucket"]): r["register"] for r in su.collect()}
    assert got == want


def test_hll_estimate_within_error_bound(spark):
    """Raw estimate within ~4 standard errors (1.04/sqrt(256) ≈ 6.5%)
    of the true cardinality, for cardinalities well above the
    small-range regime."""
    rng = random.Random(11)
    rows = [("g", rng.randrange(50_000)) for _ in range(40_000)]
    truth = len({v for _, v in rows})
    est = approx_distinct(_vals(spark, rows), ["g"], "v").collect()[0]
    rel = abs(est["estimate"] - truth) / truth
    assert rel < 4 * 1.04 / math.sqrt(256), (est["estimate"], truth)


def test_hll_register_sum_accounts_for_absent_buckets(spark):
    """One value -> one register present; the other 255 must
    contribute 2^24 each to the fixed-point sum."""
    sk = hll_sketch(_vals(spark, [("g", 42)]), ["g"], "v")
    assert sk.count() == 1
    est = hll_estimate(sk, ["g"]).collect()[0]
    reg = sk.collect()[0]["register"]
    assert est["register_sum"] == (1 << (24 - reg)) + 255 * (1 << 24)


# --- triangles ---------------------------------------------------------


def _brute_triangles(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        es.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    per_node: dict[int, int] = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if (u, v) in es and (u, w) in es and (v, w) in es:
            for n in (u, v, w):
                per_node[n] = per_node.get(n, 0) + 1
    return per_node


def test_triangle_count_matches_brute_force(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangle_count_single_triangle_with_hub(spark):
    """A hub node of high degree plus one triangle: each triangle
    corner reports exactly 1, the hub's spokes report nothing."""
    edges = [(1, 2), (2, 3), (1, 3)] + [(99, i) for i in range(10, 40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# --- rolling z-score ---------------------------------------------------


def test_rolling_zscore_hand_computed(spark):
    """7 flat days then a spike: the spike's z is (x-mean)/std of the
    7 trailing counts; flat days have var=0 -> null z."""
    us = 86_400_000_000
    rows = []
    for day in range(7):
        rows += [("a", day * us + i) for i in range(10)]
    rows += [("a", 7 * us + i) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, t long")
    out = {
        r["day"]: r
        for r in rolling_zscore(df, ["g"], "t", 7, 5).collect()
    }
    spike = out[7]
    assert spike["n"] == 30 and spike["hist_days"] == 7
    assert spike["hist_mean"] == 10.0
    assert spike["z"] is None  # var of a flat history is 0
    # jittered history -> finite z
    rows2 = [("b", d * us + i) for d in range(7) for i in range(10 + d % 2)]
    rows2 += [("b", 7 * us + i) for i in range(30)]
    df2 = spark.createDataFrame(rows2, "g string, t long")
    z = {r["day"]: r["z"] for r in rolling_zscore(df2, ["g"], "t", 7, 5).collect()}[7]
    hist = [10, 11, 10, 11, 10, 11, 10]
    mean = sum(hist) / 7
    var = sum((x - mean) ** 2 for x in hist) / 6
    assert abs(z - (30 - mean) / math.sqrt(var)) < 1e-9


def test_rolling_zscore_gap_days_use_range_frame(spark):
    """A 3-day gap: RANGE frame sees only days within 7, not the last
    7 rows — day 20's history must be empty (null z)."""
    us = 86_400_000_000
    rows = [("a", d * us) for d in range(7)] + [("a", 20 * us)]
    df = spark.createDataFrame(rows, "g string, t long")
    out = {r["day"]: r for r in rolling_zscore(df, ["g"], "t", 7, 5).collect()}
    assert out[20]["hist_days"] == 0 and out[20]["z"] is None


def test_top_anomalies_deterministic_cut(spark):
    us = 86_400_000_000
    rng = random.Random(5)
    rows = [
        (g, d * us + i)
        for g in ("a", "b")
        for d in range(20)
        for i in range(10 + rng.randrange(3) + (50 if d == 15 else 0))
    ]
    df = spark.createDataFrame(rows, "g string, t long")
    top = top_anomalies(df, ["g"], "t", k=3).collect()
    assert len(top) == 3
    assert abs(top[0]["z"]) >= abs(top[1]["z"]) >= abs(top[2]["z"])
    assert {r["day"] for r in top[:2]} == {15}


# --- BPE ---------------------------------------------------------------


def _ref_bpe_merge(sym: str, left: str, right: str) -> str:
    """Reference greedy left-to-right merge over the symbol list."""
    toks = sym.split(" ")
    out = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return " ".join(out)


def test_merge_pair_equals_greedy_scan(spark):
    """The doubled-separator replace == the sequential greedy merge,
    including the overlap traps (a a a, a a a a, alternating)."""
    cases = [
        ("a a a", "a", "a"),
        ("a a a a", "a", "a"),
        ("a a a a a a", "a", "a"),
        ("b a a c", "a", "a"),
        ("x y x y", "x", "y"),
        ("h e l l o", "l", "l"),
        ("ab c ab c", "ab", "c"),
        ("q", "a", "b"),
        ("a b", "b", "a"),
    ]
    for s, l, r in cases:
        got = (
            spark.createDataFrame([(s,)], "sym string")
            .select(merge_pair(F.col("sym"), l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert got == _ref_bpe_merge(s, l, r), (s, l, r, got)


def test_bpe_train_three_merges(spark):
    """Deterministic toy corpus: 'banana' x3 + 'bandana' x2. Most
    frequent pair is (a, n) [5+... occurrences]; verify the full
    3-merge trajectory against a driver-side reference trainer."""
    docs = spark.createDataFrame(
        [("banana banana banana bandana bandana",)], "text string"
    )
    words = word_freq_table(docs, "text")
    _, merges = bpe_train(words, k=3)
    assert len(merges) == 3

    # driver-side reference: word freq table -> greedy merges
    freq = {"banana": 3, "bandana": 2}
    syms = {w: " ".join(w) for w in freq}
    for it, lhs, rhs, cnt in merges:
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in freq.items():
            toks = syms[w].split(" ")
            for x, y in zip(toks, toks[1:]):
                pair_counts[(x, y)] = pair_counts.get((x, y), 0) + c
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        assert (lhs, rhs) == best[0], (it, lhs, rhs, best)
        assert cnt == best[1]
        for w in syms:
            syms[w] = _ref_bpe_merge(syms[w], lhs, rhs)


def test_word_freq_table_lowercases_and_bounds(spark):
    docs = spark.createDataFrame(
        [("The the THE a verylongwordbeyondtwelve ok-ok",)], "text string"
    )
    got = {r["word"]: r["cnt"] for r in word_freq_table(docs, "text").collect()}
    assert got == {"the": 3, "ok": 2}


# random projection + bpe encode (round-7 late additions)
# ---------------------------------------------------------------------


def test_random_projection_deterministic_and_jl(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from duo_spark.operators.similarity import random_projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    p1 = {r["vec_id"]: r["projected"]
          for r in random_projection(emb).select("vec_id", "projected").collect()}
    p2 = {r["vec_id"]: r["projected"]
          for r in random_projection(emb).select("vec_id", "projected").collect()}
    assert p1 == p2  # hash-derived matrix: no RNG, no seed drift
    assert all(len(v) == 16 for v in p1.values())
    # JL sanity: projected pairwise distances within a loose band of
    # the originals (d_out=16 gives ~50% eps at n=50; assert 0.2-2.5x)
    orig = {r["vec_id"]: r["embedding"]
            for r in emb.select("vec_id", "embedding").collect()}
    ids = sorted(orig)[:10]
    for a, b in zip(ids, ids[1:]):
        do = math.dist(orig[a], orig[b])
        dp = math.dist(p1[a], p1[b])
        if do > 0:
            assert 0.2 < dp / do < 2.5, (a, b, dp, do)


def test_bpe_encode_reproduces_training_segmentation(spark, sf_dir):
    """Sennrich et al. §3: encoding with the learned merge list yields
    the same vocabulary as the training run's final symbol table."""
    from pyspark.sql import functions as F

    from duo_spark.operators.bpe import bpe_encode, bpe_train, word_freq_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_freq_table(docs, "text")
    final, merges = bpe_train(words, k=3)
    want = {
        (r["token"], r["n"])
        for r in final.select(
            "cnt", F.explode(F.split("sym", " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    final.unpersist()
    got = {(r["token"], r["n"])
           for r in bpe_encode(docs, merges, "text").collect()}
    assert got == want and got
    # merged symbols actually appear in the encoded vocabulary
    merged_syms = {l + r for _, l, r, _ in merges}
    assert merged_syms & {t for t, _ in got}


def test_random_projection_bake_and_hash_paths_identical(spark, sf_dir):
    """The size-gated literal bake must be bit-identical to the
    per-cell hash evaluation it replaces, and the hash path must
    handle dimensions where baking would blow up the plan text."""
    from pyspark.sql import Row

    from duo_spark.operators.similarity import random_projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(30)
    a = {r["vec_id"]: r["projected"] for r in
         random_projection(emb, bake=True).select("vec_id", "projected").collect()}
    b = {r["vec_id"]: r["projected"] for r in
         random_projection(emb, bake=False).select("vec_id", "projected").collect()}
    assert a == b
    # 768x64 auto-selects the hash path (49k cells > threshold) and
    # still plans + runs
    big = spark.createDataFrame(
        [Row(vec_id=1, embedding=[float(i % 7) for i in range(768)])]
    )
    out = random_projection(big, d_in=768, d_out=64).select("projected").first()
    assert len(out["projected"]) == 64


# round 8: batched BPE trainer + guards
# ---------------------------------------------------------------------


def test_bpe_train_batched_pinned_equal_when_disjoint(spark):
    """Three symbol-disjoint two-letter words: batched (one round,
    B=3) must reproduce the sequential greedy trajectory exactly —
    the non-interacting-merges equivalence contract."""
    from duo_spark.operators.bpe import bpe_train, bpe_train_batched

    docs = spark.createDataFrame(
        [(" ".join(["xy"] * 10 + ["pq"] * 8 + ["rs"] * 6),)],
        "text string",
    )
    words = word_freq_table(docs, "text")
    _n1, seq = bpe_train(words, k=3, return_table=False)
    _n2, bat = bpe_train_batched(words, k=3, batch=3, return_table=False)
    assert seq == bat == [(1, "x", "y", 10), (2, "p", "q", 8), (3, "r", "s", 6)]


def test_bpe_train_batched_batch1_equals_sequential(spark, sf_dir):
    """batch=1 degenerates to greedy top-1 — pinned identical merges
    AND identical final symbol tables on the real documents table."""
    from pyspark.sql import functions as F

    from duo_spark.operators.bpe import bpe_train, bpe_train_batched

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_freq_table(docs, "text")
    t1, seq = bpe_train(words, k=4)
    t2, bat = bpe_train_batched(words, k=4, batch=1)
    assert seq == bat
    rows1 = sorted((r["cnt"], r["sym"]) for r in t1.collect())
    rows2 = sorted((r["cnt"], r["sym"]) for r in t2.collect())
    assert rows1 == rows2


def test_bpe_train_batched_skips_interacting_pairs_within_round(spark):
    """'aaaa'x5: top pair is (a,a); the next-ranked candidates all
    share the symbol 'a', so a B=3 round must select only (a,a) and
    defer the rest — never apply two merges touching one symbol in
    the same pass."""
    from duo_spark.operators.bpe import bpe_train_batched

    docs = spark.createDataFrame([(" ".join(["aaaa"] * 5),)], "text string")
    words = word_freq_table(docs, "text")
    _t, merges = bpe_train_batched(words, k=2, batch=3, return_table=False)
    # round 1: only (a,a) selectable; round 2: (aa,aa)
    assert merges[0][1:3] == ("a", "a")
    assert merges[1][1:3] == ("aa", "aa")


def test_bpe_train_return_table_false_returns_none(spark):
    from duo_spark.operators.bpe import bpe_train, bpe_train_batched

    docs = spark.createDataFrame([("banana banana",)], "text string")
    words = word_freq_table(docs, "text")
    t, merges = bpe_train(words, k=2, return_table=False)
    assert t is None and len(merges) == 2
    t, merges = bpe_train_batched(words, k=2, batch=2, return_table=False)
    assert t is None and merges


def test_cms_and_bloom_reject_too_many_hash_rows(spark):
    """ADVICE r7: d/k beyond the fixed seed table must raise, not
    silently degrade the error bound."""
    import pytest

    from duo_spark.operators.sketch import (
        bloom_build,
        cms_lookup,
        cms_sketch,
    )

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="fixed hash seeds"):
        cms_sketch(df, "v", d=8)
    with pytest.raises(ValueError, match="fixed hash seeds"):
        cms_lookup(cms_sketch(df, "v", d=4), df, "v", d=5)
    with pytest.raises(ValueError, match="fixed hash seeds"):
        bloom_build(df, "v", k=6, portable=True)


def test_random_projection_short_vector_raises_null_passes(spark):
    """ADVICE r7: a vector shorter than d_in must fail loudly (Spark's
    element_at would NULL-poison the fold while DuckDB's list_sum
    skips NULLs — silent cross-engine divergence); NULL vectors stay
    NULL."""
    import pytest

    from duo_spark.operators.similarity import random_projection

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="shorter than d_in"):
        random_projection(bad, "embedding", d_in=64, d_out=16).collect()
    nul = spark.createDataFrame(
        [(1, None)], "vec_id int, embedding array<double>"
    )
    got = random_projection(nul, "embedding", d_in=64, d_out=16).collect()
    assert got[0]["projected"] is None
