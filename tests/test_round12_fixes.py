"""Round-12 ADVICE fixes: ANSI-mode divide-by-zero hardening in
tokenizer_fertility and margin_mine, the dhash_near_dup uniform-length
contract made loud, and ccnet_buckets' NULL-lang slice getting its own
terciles instead of an unconditional 'tail'."""

from __future__ import annotations

import pytest


def test_tokenizer_fertility_all_empty_slice_yields_null_ratios(spark):
    """A language slice of empty/whitespace docs has n_words =
    n_subwords = 0; under ANSI mode a plain division killed the job
    (DIVIDE_BY_ZERO). try_divide returns NULL — matching what the
    DuckDB oracle computes for the same input."""
    from duo_spark.operators.text import tokenizer_fertility

    df = spark.createDataFrame(
        [("", "xx"), ("   ", "xx"), ("hello world", "en")],
        "text string, lang string",
    )
    rows = {r.lang: r for r in tokenizer_fertility(df).collect()}
    assert rows["xx"].n_words == 0 and rows["xx"].n_subwords == 0
    assert rows["xx"].fertility is None
    assert rows["xx"].chars_per_subword is None
    assert rows["xx"].bytes_per_subword is None
    assert rows["en"].fertility == 1.0
    assert rows["en"].chars_per_subword == 5.5


def test_margin_mine_orthogonal_neighborhoods_drop_not_crash(spark):
    """Mutually orthogonal corpus/pool embeddings quantize every top-k
    cosine to 0, so fwd_mean + bwd_mean == 0 — the margin division must
    not raise under ANSI; a NULL margin fails the threshold filter and
    the pair is (correctly) dropped."""
    from duo_spark.operators.similarity import margin_mine

    corpus = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    pool = spark.createDataFrame(
        [(10 + i, [1.0 if j == 4 + i else 0.0 for j in range(8)])
         for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    assert margin_mine(corpus, pool, k=2, threshold=0.5).count() == 0


def test_dhash_near_dup_mixed_length_hashes_fail_loud(spark):
    """F.substring past a short hash's end returns '' on both compare
    sides, silently ignoring tail bits — the length guard must turn
    that into a loud error instead of an undercount."""
    from duo_spark.operators.multimodal import dhash_near_dup

    mixed = spark.createDataFrame(
        [("a", "0101"), ("b", "010")], "id string, h string"
    )
    with pytest.raises(Exception, match="uniform-length contract"):
        dhash_near_dup(
            mixed, id_col="id", hash_col="h", bits=4, max_hamming=1
        ).collect()

    # the same guard fires when the caller passes bits smaller than the
    # true uniform length (previously: tail bits silently dropped)
    uniform = spark.createDataFrame(
        [("a", "0101"), ("b", "0111")], "id string, h string"
    )
    with pytest.raises(Exception, match="uniform-length contract"):
        dhash_near_dup(
            uniform, id_col="id", hash_col="h", bits=3, max_hamming=1
        ).collect()

    out = dhash_near_dup(
        uniform, id_col="id", hash_col="h", bits=4, max_hamming=1
    ).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [("a", "b", 1)]


def test_ccnet_buckets_null_lang_slice_gets_own_terciles(spark):
    """Scored NULL-lang docs previously always fell through to 'tail'
    (the equi-join never matched NULL). With the null-safe join the
    NULL slice keeps its own percentile thresholds."""
    from duo_spark.operators.text import ccnet_buckets

    docs = spark.createDataFrame(
        [
            (f"d{i}", "the quick brown fox jumps " * (i + 1),
             None if i % 2 else "en")
            for i in range(6)
        ],
        "doc_id string, text string, lang string",
    )
    out = {r.doc_id: r for r in ccnet_buckets(docs).collect()}
    null_buckets = {out[f"d{i}"].bucket for i in (1, 3, 5)}
    assert null_buckets == {"head", "middle", "tail"}
    en_buckets = {out[f"d{i}"].bucket for i in (0, 2, 4)}
    assert en_buckets == {"head", "middle", "tail"}


def test_png_gray_and_palette_decode_exact_sums(spark):
    """Round-12 PNG extension: color types 0 (grayscale broadcast) and
    3 (PLTE indirection) decode to the closed-form channel sums, with
    every RFC 2083 filter exercised (row y uses filter y % 5)."""
    from duo_spark.operators.multimodal import (
        decode_png,
        decode_rgb,
        synth_png_gray,
        synth_png_palette,
    )

    for mid in (0, 7, 13, 31):
        w, h = 8 + mid % 9, 8 + mid % 7
        gw, gh, r, g, b = decode_png(synth_png_gray(mid))
        exp = sum(
            (mid * 5 + x * 11 + y * 3) % 256
            for x in range(w) for y in range(h)
        )
        assert (gw, gh, r, g, b) == (w, h, exp, exp, exp)

        size = 16 + mid % 5

        def pal(i, mid=mid):
            return (
                (mid * 7 + i * 31) % 256,
                (mid * 11 + i * 17) % 256,
                (mid * 3 + i * 53) % 256,
            )

        want = [0, 0, 0]
        for x in range(w):
            for y in range(h):
                for c, v in enumerate(pal((x + y * 3 + mid) % size)):
                    want[c] += v
        pw, ph, pr, pg, pb = decode_png(synth_png_palette(mid))
        assert (pw, ph, pr, pg, pb) == (w, h, *want)

        # pixel-level path agrees with the sum path for both variants
        for blob in (synth_png_gray(mid), synth_png_palette(mid)):
            dw, dh, px = decode_rgb(blob)
            assert (dw, dh) == (w, h) and px.shape == (h, w, 3)


def test_png_palette_missing_or_short_plte_fails_loud(spark):
    """A palette PNG without PLTE (or with an index past the palette
    end) must raise, not wrap or zero-fill."""
    import pytest as _pytest

    from duo_spark.operators.multimodal import decode_png, synth_png_palette

    blob = bytearray(synth_png_palette(5))
    # strip the PLTE chunk: find its 4-byte type tag and cut the chunk
    i = blob.find(b"PLTE")
    import struct
    (ln,) = struct.unpack_from(">I", blob, i - 4)
    del blob[i - 4 : i + 4 + ln + 4]
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(blob))
