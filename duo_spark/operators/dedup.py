"""Deduplication operators for large-scale document pipelines.

Beyond the reference's surface (BASELINE.json north_star): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — each designed so the
candidate-generation step is a bounded equi-join (band buckets), never
an O(n²) cross join. At 100 TB the only shuffles are:
  exact:   one hash-partition on the content hash (map-side combine)
  minhash: explode to (band_id, band_hash) — rows × bands, then a
           self-equi-join *within buckets only*
  simhash: one pass to signatures, then band join on rotated prefixes

All signature math is JVM-side Column algebra (xxhash64 / array
higher-order functions) — no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    """Per-slot hash family: slot i uses xxhash64(i, h) seeded with the
    slot index. ANSI-safe (no 64-bit multiply wrap — Spark 4 enables
    ANSI mode by default, where ``h * a + b`` overflow throws instead
    of wrapping) and a strictly better-mixed family than an affine
    transform. Everything stays JVM-side codegen.
    """
    def _slot(i: int) -> Column:
        # NB: the lambda must stay unary — a second parameter would be
        # interpreted by Spark as the (element, index) binary form
        return F.array_min(F.transform(hash_col, lambda h: F.xxhash64(F.lit(i), h)))

    return F.array(*[_slot(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows -> (id, signature) -> explode to ``bands`` rows keyed by
    (band_index, hash(band slice)) -> self-join within buckets.
    Returns distinct (id_a, id_b) with id_a < id_b. Estimated Jaccard
    can then be computed from the signatures; callers verify exact
    similarity on the (small) candidate set.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # hash shingle strings ONCE into a materialized column, then derive
    # all signature slots from the long array (xxhash64 of strings is
    # the expensive part; the affine transforms are ~free)
    with_sig = (
        df.select(F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_sh"))
        .withColumn("_hs", F.transform("_sh", lambda s: F.xxhash64(s)))
        .select("_id", minhash_signature_from_hashes(F.col("_hs"), num_hashes).alias("_sig"))
    )
    banded = with_sig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("_sig", b * rows_per_band + 1, rows_per_band)),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard.

    The verify join re-attaches shingle sets ONLY for candidate ids
    (semi-joined subset), so exact Jaccard runs on O(candidates).
    """
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands, shingle_n)
    sh = df.select(F.col(id_col).alias("_vid"), shingles(text_col, shingle_n).alias("_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        cands.join(a, cands["id_a"] == F.col("a._vid"))
        .join(b, cands["id_b"] == F.col("b._vid"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("a._sh", "b._sh"))
                / F.size(F.array_union("a._sh", "b._sh"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via token-inverted-index join.

    explode shingles -> self-join on shingle -> per-pair intersection
    count -> jaccard = inter / (|A| + |B| - inter). The join fans out
    by shingle frequency: use MinHash LSH instead when shingle
    frequencies are skewed (this exact form is the oracle-checkable
    baseline).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    tok = sh.select("_id", "_n", F.explode("_sh").alias("_t"))
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


def simhash_signature(col: Column | str, bits: int = 64) -> Column:
    """SimHash: majority vote of word-hash bits, weighted by presence.

    For each bit position b: sign(sum over words of ±1 by bit b of
    xxhash64(word)). Returned as a LongType signature. Pure Column
    algebra: fold over the word array with a 64-slot int array
    accumulator.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.array_distinct(F.split(F.trim(c), r"\s+"))
    # hash each word exactly once, then fold ±1 bit votes over the
    # resulting longs (shift amounts must be Python ints)
    word_hashes = F.transform(words, lambda w: F.xxhash64(w))
    zero = F.array_repeat(F.lit(0), bits)
    counts = F.aggregate(
        word_hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    # pack sign bits into a long: sum(2^b where counts[b] > 0)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed + F.when(
            F.element_at(counts, b + 1) > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return packed


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """SimHash near-dup pairs: band on the top ``prefix_bits`` bits to
    bound the join, then filter by Hamming distance on the full
    signature. (Prefix banding is a recall/cost tradeoff; rotate the
    signature and re-run for higher recall.)"""
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash_signature(text_col).alias("_sig")
    ).withColumn("_band", F.shiftrightunsigned("_sig", 64 - prefix_bits))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a._band") == F.col("b._band")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
