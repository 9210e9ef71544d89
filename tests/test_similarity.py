"""Similarity-search operators: exactness of the vector math, LSH
machinery guarantees on clustered data, exact-given-candidates on the
(near-orthogonal) driver embeddings, multimodal golden pin.
VERDICT r1 item #9: the no_oracle queries get real checks."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from duo_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def clustered(spark):
    """Constructed fixture with REAL cluster structure: 8 anchors, 25
    members each at small angular noise — the regime LSH pruning is
    built for (driver embeddings are near-orthogonal: max pair cosine
    ~0.5, where no sublinear ANN can prune)."""
    rng = random.Random(11)
    dim = 32
    rows = []
    vid = 0
    for c in range(8):
        anchor = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in anchor))
        anchor = [x / n for x in anchor]
        for _ in range(25):
            noisy = [a + rng.gauss(0, 0.04) for a in anchor]
            rows.append((vid, c, [float(x) for x in noisy]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id: long, label: int, embedding: array<float>"
    ).cache()


def _exact_pairs(df, threshold):
    return {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dup_pairs(df, threshold, method="exact").collect()
    }


def test_lsh_near_dup_equals_exact_on_clustered(clustered):
    """On clustered data the banded-LSH path must reproduce the exact
    pair set (within-cluster cosines ~0.97+ -> band-miss p < 1e-12)."""
    exact = _exact_pairs(clustered, 0.9)
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dup_pairs(
            clustered, 0.9, method="lsh", dim=32, bands=32
        ).collect()
    }
    assert set(lsh) == set(exact)
    assert exact, "fixture must contain near-dup pairs"
    for p, c in lsh.items():
        assert abs(c - exact[p]) < 1e-9


def test_lsh_topk_full_recall_on_clustered(clustered):
    """ANN top-k over probed buckets must equal brute force when the
    neighbors genuinely cluster around the query."""
    qvec = [float(x) for x in clustered.filter(F.col("vec_id") == 0).first().embedding]
    exact = [r.vec_id for r in similarity.cosine_topk(clustered, qvec, k=10, exclude_ids=[0]).collect()]
    lsh = [
        r.vec_id
        for r in similarity.cosine_topk_lsh(clustered, qvec, k=10, exclude_ids=[0]).collect()
    ]
    recall = len(set(lsh) & set(exact)) / 10
    assert recall == 1.0, f"recall {recall} on clustered data"


def test_lsh_topk_exact_given_candidates(spark, emb):
    """On ANY data (driver embeddings are near-orthogonal), the LSH
    result must be exactly the brute-force top-k RESTRICTED to the
    probed buckets: pruning may cost recall, never correctness."""
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    restricted = emb.filter(similarity.lsh_candidate_condition(qvec))
    want = [
        (r.vec_id, round(r.cosine, 9))
        for r in similarity.cosine_topk(restricted, qvec, k=10, exclude_ids=[0]).collect()
    ]
    got = [
        (r.vec_id, round(r.cosine, 9))
        for r in similarity.cosine_topk_lsh(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    assert got == want


def test_lsh_udf_buckets_match_column_form(emb):
    """The vectorized matmul bucket UDF must agree bit-for-bit with the
    pure-Column hyperplane_bucket fold on every row and table."""
    got = emb.select(
        "vec_id",
        similarity.lsh_table_buckets(64).alias("b"),
        *[
            similarity.hyperplane_bucket(
                F.col("embedding"), similarity.make_hyperplanes(64, 8, 42 + t)
            ).alias(f"c{t}")
            for t in range(4)
        ],
    ).collect()
    for r in got:
        assert list(r.b) == [r.c0, r.c1, r.c2, r.c3], r.vec_id


def test_lsh_precomputed_bucket_col_same_result(emb):
    """bucket_col= (the materialize-at-ingest pattern) must give the
    identical top-k as in-query bucket computation."""
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    inline = similarity.cosine_topk_lsh(emb, qvec, k=10, exclude_ids=[0]).collect()
    pre = emb.withColumn("_lsh", similarity.lsh_table_buckets(64))
    stored = similarity.cosine_topk_lsh(
        pre, qvec, k=10, exclude_ids=[0], bucket_col="_lsh"
    ).collect()
    assert [(r.vec_id, round(r.cosine, 9)) for r in inline] == [
        (r.vec_id, round(r.cosine, 9)) for r in stored
    ]


def test_topk_many_matches_single_query_form(emb):
    queries = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = similarity.cosine_topk_many(emb, queries, k=5)
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine, 9))
        for r in batch.collect()
    }
    for qid in (1, 2):
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == qid).first().embedding]
        single = similarity.cosine_topk(emb, qvec, k=5).collect()
        for rank, r in enumerate(single, start=1):
            assert got[(qid, rank)] == (r.vec_id, round(r.cosine, 9))


def test_ivf_assign_members_nearest_own_centroid(clustered):
    """With the true anchors as centroids, assignment must agree with
    the labels for (nearly) all members."""
    import numpy as np

    rows = clustered.collect()
    cents = []
    for c in range(8):
        vecs = [r.embedding for r in rows if r.label == c]
        cents.append([float(x) for x in np.mean(np.array(vecs), axis=0)])
    assigned = similarity.ivf_assign(clustered, cents)
    mismatch = assigned.filter(F.col("_cell") != F.col("label")).count()
    assert mismatch == 0


def test_multimodal_features_independent_recompute(spark, sf_dir):
    """Verify the mapInPandas decode path against an INDEPENDENT
    driver-side recomputation of the slot-0 rolling byte hash from the
    raw parquet text (replacing the old self-referential golden hash;
    the DuckDB oracle in test_oracle_parity replays the same math in
    SQL). Catches plumbing bugs (batch boundaries, column order,
    float32 quantization) and codec regressions alike."""
    import pyarrow.parquet as pq

    from duo_spark.queries import q_multimodal_features

    rows = q_multimodal_features(spark, sf_dir).collect()
    got = {r.media_id: (r.n_bytes, r.f0_acc) for r in rows}
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        data = text.encode("utf-8")
        acc = 0
        for byte in data[::8]:  # slot 0 of the 8-slot rolling hash
            acc = (acc * 31 + byte) % 997
        want[doc_id] = (len(data), acc)
    assert got == want


def test_ivf_search_equals_restricted_bruteforce(clustered):
    """ivf_search must equal a numpy reference that replicates the
    pruning exactly: first-max cell assignment, top-nprobe probe with
    index tiebreak, exact cosine top-k (id tiebreak) within the
    probed cells."""
    import numpy as np

    rows = sorted(clustered.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cent_ids = [0, 25, 50, 75, 100, 125, 150, 175]  # first member per cluster
    centroids = [[float(x) for x in V[i]] for i in cent_ids]
    Cn = Vn[cent_ids]
    cells = np.argmax(Vn @ Cn.T, axis=1)  # np.argmax = first-max tiebreak

    qids = [3, 77, 130]
    queries = clustered.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in similarity.ivf_search(clustered, queries, centroids, k=5, nprobe=2).collect()
    }
    assert len(got) == len(qids) * 5
    for q in qids:
        qsims = Vn[q] @ Cn.T
        probe = sorted(range(8), key=lambda c: (-qsims[c], c))[:2]
        mask = np.isin(cells, probe)
        cand_ids, cand = ids[mask], Vn[mask]
        cos = cand @ Vn[q]
        order = sorted(range(len(cand_ids)), key=lambda i: (-cos[i], cand_ids[i]))[:5]
        for rank, i in enumerate(order, start=1):
            vid, c = got[(q, rank)]
            assert vid == cand_ids[i]
            assert abs(c - cos[i]) < 1e-9


def test_kmeans_fit_matches_numpy_lloyd(clustered):
    """kmeans_fit must replay driver-side Lloyd iterations exactly:
    same init (lowest ids), same cosine argmax with first-max
    tiebreak, same plain-mean recenter."""
    rows = sorted(clustered.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id)
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    k, iters = 4, 3
    cents = V[:k].copy()
    for _ in range(iters):
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        cells = np.argmax(Vn @ Cn.T, axis=1)
        cents = np.array(
            [V[cells == c].mean(axis=0) if (cells == c).any() else cents[c] for c in range(k)]
        )
    got = similarity.kmeans_fit(clustered, k, max_iter=iters, tol=0.0)
    assert np.abs(np.array(got) - cents).max() < 1e-9


def test_kmeans_fit_converges_and_keeps_empty_cell_centroid(spark):
    # two tight clusters, k=3: one centroid starts between and loses
    # all members -> must keep its previous position, not crash
    rows = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(3)]
    rows += [(10 + i, [0.0, 10.0 + 0.01 * i]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_fit(df, 3, max_iter=5)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)


def test_semantic_dedup_groups_clustered_data(clustered):
    """On the clustered fixture (8 tight cones, within-cluster cosine
    ~0.99, cross-cluster ~0), semantic_dedup with k=8 must put every
    cone into one dup_group whose canonical is the cone's minimum id,
    with no cross-cone merges."""
    out = similarity.semantic_dedup(
        clustered, threshold=0.9, k=8, kmeans_iter=3
    ).collect()
    assert len(out) == 200
    by_id = {r.vec_id: r for r in out}
    for vid, r in by_id.items():
        cone_min = (vid // 25) * 25  # members 25c..25c+24
        assert r.dup_group == cone_min, (vid, r.dup_group)
        assert r.is_canonical == (vid == cone_min)


def test_semantic_dedup_pairs_only_within_cells(emb):
    """On the near-orthogonal driver embeddings every dup_group member
    set must be closed under the cell assignment: a group never spans
    two cells (the SemDeDup approximation is within-cell only)."""
    out = similarity.semantic_dedup(emb, threshold=0.35, k=4, kmeans_iter=1)
    rows = out.collect()
    cell_of = {r.vec_id: r.cell for r in rows}
    groups: dict[int, set[int]] = {}
    for r in rows:
        groups.setdefault(r.dup_group, set()).add(cell_of[r.vec_id])
    multi = [g for g, cells in groups.items() if len(cells) > 1]
    assert multi == []
    # and the canonical really is the minimum member id
    mins: dict[int, int] = {}
    for r in rows:
        mins[r.dup_group] = min(mins.get(r.dup_group, r.vec_id), r.vec_id)
    for g, m in mins.items():
        assert g == m


def test_sample_frames_shapes_and_checksums(spark):
    """Frame fan-out: exact slicing, cap, null-payload drop."""
    from duo_spark.operators.multimodal import sample_frames

    rows = [
        (1, "a", bytes(range(10))),          # 10 bytes -> frames [0..3],[4..7],[8..9]
        (2, "a", None),                      # dropped
        (3, "a", b""),                       # zero-length -> no frames
        (4, "a", bytes(range(100))),         # capped at 2 frames
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    got = {
        (r.media_id, r.frame_idx): (r.frame_bytes, r.checksum)
        for r in sample_frames(df, frame_bytes=4, max_frames=2).collect()
    }
    assert got[(1, 0)] == (4, 0 + 1 + 2 + 3)
    assert got[(1, 1)] == (4, 4 + 5 + 6 + 7)
    assert (1, 2) not in got  # cap
    assert got[(4, 0)] == (4, 6)
    assert got[(4, 1)] == (4, 22)
    assert not any(m in (2, 3) for m, _ in got)


def test_ivf_index_prunes_partitions_and_matches_inline_search(spark, emb, tmp_path):
    """build_ivf_index + ivf_search_indexed: the persisted-index search
    must (a) read ONLY the probed cells' partition directories and
    (b) return exactly what the self-contained ivf_search computes on
    the same centroids."""
    cents = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    probed = similarity.ivf_probe_cells(queries, cents, nprobe=1)
    probe_cells = {r["_cell"] for r in probed.select("_cell").distinct().collect()}
    assert len(probe_cells) < 4  # the test is vacuous if nothing prunes

    indexed = similarity.ivf_search_indexed(
        spark, path, queries, cents, k=5, nprobe=1
    )
    got = {(r.query_id, r.rank): (r.vec_id, round(r.cosine, 9)) for r in indexed.collect()}
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine, 9))
        for r in similarity.ivf_search(emb, queries, cents, k=5, nprobe=1).collect()
    }
    assert got == want

    # files actually read = only probed-cell directories
    scan = spark.read.parquet(path).filter(
        F.col("_cell").isin(sorted(probe_cells))
    )
    read_files = [r[0] for r in scan.select(F.input_file_name()).distinct().collect()]
    assert read_files, "scan read no files"
    for f in read_files:
        assert any(f"_cell={c}" in f for c in probe_cells), f


def test_semantic_dedup_threshold_margin_dominates_float_noise(emb):
    """The gate data's closest cosine to the 0.4 threshold must sit
    orders of magnitude above pairwise-vs-sequential summation noise
    (~1e-15 relative) — the precondition for swapping the matmul pair
    kernel in without oracle risk (see _within_cell_pairs)."""
    import numpy as np

    rows = emb.select("embedding").collect()
    v = np.array([r[0] for r in rows], dtype=np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = (vn @ vn.T)[np.triu_indices(len(rows), 1)]
    assert np.abs(s - 0.4).min() > 1e-7


# ---------------------------------------------------------------------
# int8 quantization + rescore ANN
# ---------------------------------------------------------------------

def test_quantized_topk_matches_exact(spark):
    """On the gate embeddings, the quantized coarse pass + float
    rescore returns the SAME top-10 as the float brute force."""
    from duo_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [(r.vec_id, round(r.cosine, 6)) for r in
             sim.cosine_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10).collect()]
    qt = sim.quantize_embeddings(emb.filter(F.col("vec_id") != 0))
    quant = [(r.vec_id, round(r.cosine, 6)) for r in
             sim.cosine_topk_quantized(qt, qvec, k=10, refine=4).collect()]
    assert quant == exact


def test_quantize_embeddings_codes_and_zero_vector(spark):
    from duo_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [127.0, -63.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in sim.quantize_embeddings(df).collect()}
    assert rows[1].q_embedding == [127, -64, 0]   # HALF_UP away from zero
    assert rows[1].q_scale == 1.0
    assert rows[2].q_embedding == [0, 0, 0]       # zero vector -> scale 1
    assert rows[2].q_scale == 1.0


def test_quantized_topk_validates_params(spark):
    from duo_spark.operators import similarity as sim

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    qt = sim.quantize_embeddings(df)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sim.cosine_topk_quantized(qt, [1.0], k=0)
    with _pytest.raises(ValueError):
        sim.cosine_topk_quantized(qt, [1.0], k=1, refine=0)


# ---------------------------------------------------------------------
# centroids_by_group (round 5)
# ---------------------------------------------------------------------

def test_centroids_by_group_matches_numpy(spark):
    import numpy as np
    from duo_spark.operators.similarity import centroids_by_group

    rng = np.random.default_rng(9)
    rows = [(int(i % 3), rng.normal(size=8).astype("float32").tolist())
            for i in range(90)]
    rows.append((7, None))  # null vector excluded entirely
    df = spark.createDataFrame(rows, "label int, embedding array<float>")

    got = {r.label: (r.n, np.array(r.centroid))
           for r in centroids_by_group(df, "label", dim=8).collect()}
    assert 7 not in got
    by_label = {}
    for lab, v in rows[:-1]:
        by_label.setdefault(lab, []).append(np.array(v, dtype=np.float64))
    for lab, vecs in by_label.items():
        n, c = got[lab]
        assert n == len(vecs)
        assert np.allclose(c, np.mean(vecs, axis=0), atol=1e-9)

    normed = {r.label: np.array(r.centroid)
              for r in centroids_by_group(df, "label", dim=8,
                                          normalize=True).collect()}
    for lab, c in normed.items():
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9


def test_centroids_by_group_empty_raises(spark):
    import pytest
    from duo_spark.operators.similarity import centroids_by_group

    empty = spark.createDataFrame([], "label int, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        centroids_by_group(empty, "label")


def test_exact_pairs_string_ids(spark):
    """Regression: method='exact' must keep non-integer id columns
    working (the blocked rewrite briefly force-cast ids to long,
    which nulled string ids and crashed)."""
    from duo_spark.operators.similarity import embedding_near_dup_pairs

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.01]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    got = {(r.id_a, r.id_b): round(r.cosine, 3)
           for r in embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] > 0.99


def test_exact_pairs_oversize_fails_fast(spark, monkeypatch):
    """ADVICE r5: method='exact' collects the whole matrix to the
    driver — an oversized input must raise a clear error pointing to
    method='lsh' BEFORE any collect, not OOM the driver."""
    import pytest

    from duo_spark.operators import similarity

    monkeypatch.setattr(similarity, "EXACT_PAIRS_MAX_MATRIX_BYTES", 16)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(ValueError, match="method='lsh'"):
        similarity.embedding_near_dup_pairs(df, threshold=0.99, method="exact")


def test_lit_double_array_bit_identical_to_per_element_lits(spark):
    """_lit_double_array (one F.expr round trip) must produce the
    exact Literal doubles F.array(*[F.lit(x)...]) would — repr
    round-trips IEEE doubles, so every bit pattern survives the SQL
    parse, including negatives, subnormal-range and huge magnitudes."""
    import struct

    rng = random.Random(1234)
    vals = [rng.gauss(0.0, 1.0) for _ in range(64)] + [
        0.0, -0.0, 1e-300, -3e300, 12345.678901234567,
    ]
    df = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in vals]).alias("a"),
        similarity._lit_double_array(vals).alias("b"),
    )
    assert dict(df.dtypes) == {"a": "array<double>", "b": "array<double>"}
    row = df.first()
    bits = lambda xs: [struct.pack("<d", v) for v in xs]  # noqa: E731
    assert bits(row["a"]) == bits(row["b"])
