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


def _encode_gray_jpeg(width, height, coef_blocks, qtab):
    """Test-local baseline JPEG encoder for arbitrary zigzag
    coefficient blocks (grayscale, one component) — exercises the
    decoder's AC run-length / ZRL / EOB paths, which the DC-only
    synth_jpeg gate never emits."""
    import struct

    from duo_spark.operators.multimodal import (
        _JPEG_STD_AC,
        _JPEG_STD_DC,
        _jpeg_canonical,
        _JpegBitWriter,
    )

    dc_codes = _jpeg_canonical(*_JPEG_STD_DC)
    ac_codes = _jpeg_canonical(*_JPEG_STD_AC)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab))
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
               + struct.pack(">BBB", 1, 0x11, 0))
    out += seg(0xC4, bytes([0x00]) + _JPEG_STD_DC[0] + _JPEG_STD_DC[1])
    out += seg(0xC4, bytes([0x10]) + _JPEG_STD_AC[0] + _JPEG_STD_AC[1])
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    w = _JpegBitWriter()
    pred = 0
    for blk in coef_blocks:
        diff = blk[0] - pred
        pred = blk[0]
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
        for k in range(1, last_nz + 1):
            if blk[k] == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            s = abs(blk[k]).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            w.put(blk[k] if blk[k] >= 0 else blk[k] + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
    w.align()
    out += w.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_ac_runlength_decode_matches_reference_idct(spark):
    """Random AC coefficients (runs, ZRL, EOB, negative amplitudes)
    through the real entropy decoder must reproduce a reference
    direct-cosine-sum IDCT with libjpeg plane rounding, exactly."""
    import numpy as np

    from duo_spark.operators.multimodal import _JPEG_ZIGZAG, _jpeg_reconstruct

    rng = np.random.RandomState(42)
    qtab = [(i % 16) + 1 for i in range(64)]
    blocks = []
    for _ in range(4):  # 16x16 grayscale = 4 blocks
        blk = [0] * 64
        blk[0] = int(rng.randint(-200, 200))
        for _k in range(rng.randint(1, 12)):
            blk[int(rng.randint(1, 64))] = int(rng.randint(-255, 256))
        blocks.append(blk)
    blob = _encode_gray_jpeg(16, 16, blocks, qtab)
    w, h, got = _jpeg_reconstruct(blob)
    assert (w, h) == (16, 16)

    # independent reference: de-zigzag, dequant, direct O(64^2) IDCT
    def ref_block(blk):
        C = np.zeros((8, 8))
        for i, pos in enumerate(_JPEG_ZIGZAG):
            C[pos // 8, pos % 8] = blk[i] * qtab[i]
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * C[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s
        return np.clip(np.floor(out + 128.0 + 0.5), 0, 255)

    want = np.zeros((16, 16))
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, 2)
        want[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = ref_block(blk)
    assert np.array_equal(got[:, :, 0].astype(float), want)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_jpeg_dc_only_variants_closed_form(spark):
    """synth_jpeg's four scan shapes (gray / 4:4:4 / 4:2:0 + DRI /
    4:2:2) decode to the closed-form pixels the SQL oracle replays."""
    import numpy as np

    from duo_spark.operators.multimodal import (
        decode_bmp,
        decode_jpeg,
        synth_jpeg,
        _jpeg_reconstruct,
    )

    def clamp(x):
        return max(0, min(255, int(np.floor(x + 0.5))))

    for mid in (0, 1, 2, 3, 4, 5, 10, 11):
        v = mid % 4
        if v == 0:
            w, h = 8 * (2 + mid % 3), 8 * (2 + mid % 2)
        elif v == 2:
            w, h = 16 * (1 + mid % 2), 16
        else:
            w = h = 16
        dw, dh, px = _jpeg_reconstruct(synth_jpeg(mid))
        assert (dw, dh) == (w, h)
        for (x, y) in ((0, 0), (w - 1, h - 1), (w // 2, h // 3)):
            yv = (mid * 29 + (x // 8) * 31 + (y // 8) * 37) % 256
            if v == 0:
                exp = (yv, yv, yv)
            else:
                dx = 8 if v == 1 else 16
                dy = 16 if v == 2 else 8
                cb = (mid * 17 + (x // dx) * 11 + (y // dy) * 41) % 256 - 128
                cr = (mid * 23 + (x // dx) * 13 + (y // dy) * 43) % 256 - 128
                exp = (
                    clamp(yv + 1.402 * cr),
                    clamp(yv - 0.344136 * cb - 0.714136 * cr),
                    clamp(yv + 1.772 * cb),
                )
            assert tuple(int(c) for c in px[y, x]) == exp, (mid, x, y)
        # sum path and dispatch agree with the pixel path
        assert decode_bmp(synth_jpeg(mid)) == decode_jpeg(synth_jpeg(mid))


def test_jpeg_rejects_progressive_and_garbage(spark):
    import struct

    import pytest as _pytest

    from duo_spark.operators.multimodal import decode_jpeg

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # SOF2 progressive is SUPPORTED since round 12; extended
    # sequential (SOF1) and lossless (SOF3) still reject loud
    sof1 = (b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xC1, 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    with _pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(sof1)


def test_ngram_diversity_approx_tracks_exact(spark):
    """approx=True reuses the repo HLL register algebra: the estimate
    must track the exact distinct within the m=4096 error envelope and
    be deterministic across runs (integer registers, one float
    divide). The shuffle carries at most m register rows per n — the
    100-TB rationale."""
    from duo_spark.operators.text import ngram_diversity

    docs = spark.createDataFrame(
        [(i, f"tok{i % 97} tok{(i * 7) % 89} tok{(i * 13) % 83} word{i}")
         for i in range(400)],
        "doc_id long, text string",
    )
    exact = {r.n: r for r in ngram_diversity(docs).collect()}
    approx = {r.n: r for r in ngram_diversity(docs, approx=True).collect()}
    approx2 = {r.n: r for r in ngram_diversity(docs, approx=True).collect()}
    for n in (1, 2, 3):
        assert approx[n].total_ngrams == exact[n].total_ngrams
        rel = abs(approx[n].distinct_ngrams - exact[n].distinct_ngrams) / max(
            exact[n].distinct_ngrams, 1
        )
        assert rel < 0.08, (n, approx[n].distinct_ngrams,
                            exact[n].distinct_ngrams)
        assert approx[n].distinct_ngrams == approx2[n].distinct_ngrams


def test_broadcast_matrix_byte_cap_trips_on_fat_dims(spark):
    """VERDICT r11 #5: the broadcast-matrix collects must be byte-
    denominated, not just row-denominated — a fat-dimension frame must
    trip the byte cap while still under the row cap, and the error
    must name both knobs."""
    import pytest as _pytest

    from duo_spark.operators.decontam import semantic_decontam
    from duo_spark.operators.similarity import margin_mine

    # 10 rows x dim=64 float64 = 5120 bytes; byte cap of 4096 allows
    # only 8 rows -> trips while max_rows=200k is nowhere near
    fat = spark.createDataFrame(
        [(i, [float(i + j) for j in range(64)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="max_pool_bytes"):
        margin_mine(fat, fat, k=2, max_pool_bytes=4096)
    with _pytest.raises(ValueError, match="max_benchmark_bytes"):
        semantic_decontam(fat, fat, max_benchmark_bytes=4096)

    # row cap unchanged: trips by name too
    with _pytest.raises(ValueError, match="max_pool"):
        margin_mine(fat, fat, k=2, max_pool=2)
    with _pytest.raises(ValueError, match="max_benchmark"):
        semantic_decontam(fat, fat, max_benchmark=2)

    # within both caps still works
    out = semantic_decontam(fat, fat, threshold=0.99)
    assert out.count() == 10  # every row matches itself at cos 1.0


def test_curation_ladder_sentence_stage(spark):
    """sentence_dedup=True prepends the CCNet pass: boilerplate
    sentences vanish from surviving docs' text, all-boilerplate docs
    drop, and the funnel gains a leading stage-0 row whose counts
    chain into the quality stage."""
    from duo_spark.pipelines import curate_documents

    good = ("the quick brown fox jumps over a lazy dog and it "
            "is of great renown in the old tales. ")
    docs = spark.createDataFrame(
        [
            (1, good + "Accept cookies now."),
            (2, good.replace("quick", "clever") + "Accept cookies now."),
            (3, good.replace("quick", "sly") + "Accept cookies now."),
            (4, good.replace("quick", "swift") + "Accept cookies now."),
            (5, "Accept cookies now."),  # all boilerplate -> drops
        ],
        "doc_id long, text string",
    )
    out = curate_documents(
        docs, min_quality=0, langs=("en",), blocklist=(),
        near_dup_threshold=0.99, sentence_dedup=True,
        sentence_max_doc_freq=2,
    )
    funnel = {r.stage: r for r in out["funnel"].collect()}
    assert funnel["sentence_dedup"].rows_in == 5
    assert funnel["sentence_dedup"].rows_out == 4  # doc 5 dropped
    assert funnel["quality"].rows_in == 4  # chains into stage 1
    kept = {r.doc_id: r.text for r in out["kept"].collect()}
    assert 5 not in kept
    assert all("Accept cookies" not in t for t in kept.values())

    # off by default: identical to the round-11 ladder (no stage row)
    base = curate_documents(docs, min_quality=0, langs=("en",),
                            blocklist=(), near_dup_threshold=0.99)
    assert [r.stage for r in base["funnel"].collect()] == [
        "quality", "language", "blocklist", "exact_dedup", "near_dedup",
    ]


def test_doremi_weights_upweights_high_excess_domains(spark):
    """DoReMi shape: domains above the corpus-mean loss get positive
    excess and a larger-than-uniform weight; weights sum to ~1; NULL
    domain and NULL loss survive the aggregate."""
    from duo_spark.operators.selection import doremi_weights

    df = spark.createDataFrame(
        [("web", 2.0), ("web", 2.2), ("books", 1.1),
         ("code", 3.5), ("code", 3.1), (None, 2.6), ("web", None)],
        "source string, loss double",
    )
    out = {r.source: r for r in
           doremi_weights(df, "source", "loss", eta=0.5, steps=5).collect()}
    assert out["code"].excess > 0 and out["books"].excess == 0.0
    assert out["code"].weight > 0.25 > out["books"].weight
    assert out[None].n_docs == 1  # NULL domain is its own group
    assert out["web"].n_docs == 2  # NULL loss not counted
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5

    # closed form at steps=1: softmax(eta * excess) blended w/ uniform
    import math
    ex = {d: out[d].excess for d in out}
    z = sum(math.exp(0.5 * e) for e in ex.values())
    want = (1 - 1e-3) * math.exp(0.5 * ex["code"]) / z + 1e-3 / 4
    got = {r.source: r for r in
           doremi_weights(df, "source", "loss", eta=0.5, steps=1).collect()}
    assert abs(got["code"].weight - want) < 2e-6


def test_line_filter_rules(spark):
    """C4 line rules: min-words, letter requirement, bullet drop,
    terminal punctuation; counts + rewrite; empty docs keep a row."""
    from duo_spark.operators.text import line_filter

    df = spark.createDataFrame(
        [(1, "A good long line here.\n- bullet line with words.\n"
             "12345 67 89\nshort one\nAnother keeper line."),
         (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           line_filter(df, require_terminal=True).collect()}
    assert (out[1].n_lines, out[1].n_kept) == (5, 2)
    assert out[1].text_clean == "A good long line here.\nAnother keeper line."
    assert (out[2].n_lines, out[2].n_kept, out[2].text_clean) == (0, 0, "")
    assert (out[3].n_lines, out[3].n_kept, out[3].text_clean) == (0, 0, "")
    # terminal rule off: 'short one' still fails min_words, numeric
    # line still fails the letter rule, bullet still drops
    loose = {r.doc_id: r for r in line_filter(df).collect()}
    assert loose[1].n_kept == 2


def test_png_16bit_gray_and_truecolor(spark):
    """16-bit PNG (round 12): the filter predictor offset is BYTES per
    pixel, samples downsample by high byte. v*257 samples reproduce
    the 8-bit closed form exactly; asymmetric bytes prove the high
    byte (not the low) wins."""
    from duo_spark.operators.multimodal import (
        _png_container,
        decode_png,
        decode_rgb,
        synth_png_gray16,
    )

    for mid in (0, 9, 20):
        w, h = 8 + mid % 9, 8 + mid % 7
        gw, gh, r, g, b = decode_png(synth_png_gray16(mid))
        exp = sum((mid * 5 + x * 11 + y * 3) % 256
                  for x in range(w) for y in range(h))
        assert (gw, gh, r, g, b) == (w, h, exp, exp, exp)

    w, h = 4, 3
    rows = []
    for _y in range(h):
        row = bytearray()
        for x in range(w):
            for c in range(3):
                row += bytes(((x * 40 + c) % 256, 0x7F))
        rows.append(bytes(row))
    dw, dh, px = decode_rgb(_png_container(w, h, 2, 6, rows, bit_depth=16))
    assert (dw, dh) == (w, h)
    assert all(px[0, x, c] == (x * 40 + c) % 256
               for x in range(w) for c in range(3))


def test_png_adam7_deinterlaces_to_progressive_pixels(spark):
    """Adam7 (round 12): seven independently-filtered passes must
    de-interlace to EXACTLY the progressive-scan image's pixels."""
    import numpy as np

    from duo_spark.operators.multimodal import (
        decode_png,
        decode_rgb,
        synth_png,
        synth_png_adam7,
    )

    for mid in (0, 5, 17, 23):
        assert decode_png(synth_png_adam7(mid)) == decode_png(synth_png(mid))
        _w, _h, p1 = decode_rgb(synth_png_adam7(mid))
        _w2, _h2, p2 = decode_rgb(synth_png(mid))
        assert np.array_equal(p1, p2)


def test_jpeg_progressive_dc_only_matches_baseline(spark):
    """synth_jpeg_progressive's scan script (DC-first Al=1 ->
    per-component AC EOBn scans -> DC refinement) must reconstruct
    exactly the closed-form pixels of the equivalent baseline
    container."""
    import numpy as np

    from duo_spark.operators.multimodal import (
        _jpeg_reconstruct,
        synth_jpeg_progressive,
    )

    for mid in (0, 1, 4, 7, 9):
        v = mid % 2
        if v == 0:
            w, h = 8 * (2 + mid % 3), 8 * (2 + mid % 2)
        else:
            w = h = 16
        dw, dh, px = _jpeg_reconstruct(synth_jpeg_progressive(mid))
        assert (dw, dh) == (w, h)

        def clamp(x):
            return max(0, min(255, int(np.floor(x + 0.5))))

        for (x, y) in ((0, 0), (w - 1, h - 1), (w // 2, h // 2)):
            yv = (mid * 29 + (x // 8) * 31 + (y // 8) * 37) % 256
            if v == 0:
                exp = (yv, yv, yv)
            else:
                cb = (mid * 17 + (x // 8) * 11 + (y // 8) * 41) % 256 - 128
                cr = (mid * 23 + (x // 8) * 13 + (y // 8) * 43) % 256 - 128
                exp = (
                    clamp(yv + 1.402 * cr),
                    clamp(yv - 0.344136 * cb - 0.714136 * cr),
                    clamp(yv + 1.772 * cb),
                )
            assert tuple(int(c) for c in px[y, x]) == exp, (mid, x, y)


def _encode_gray_progressive_ac(width, height, coef_blocks, qtab):
    """Test-local PROGRESSIVE encoder: DC-first (Al=0), then AC-first
    at Al=1 (sign-magnitude point transform), then the AC refinement
    scan with correction bits (T.81 G.1.2.2-3 / libjpeg
    encode_mcu_AC_refine) — exercises the decoder's successive-
    approximation AC paths with real nonzero coefficients."""
    import struct

    from duo_spark.operators.multimodal import (
        _JPEG_STD_AC,
        _JPEG_STD_DC,
        _JPEG_ZIGZAG,
        _jpeg_canonical,
        _JpegBitWriter,
    )

    # refine-scan table: (r<<4)|1 for r=0..15, ZRL, EOB — 18 symbols
    # all at code length 5 (canonical, kraft 18/32)
    ref_counts = bytes([0, 0, 0, 0, 18, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    ref_syms = bytes([(r << 4) | 1 for r in range(16)] + [0xF0, 0x00])
    dc_codes = _jpeg_canonical(*_JPEG_STD_DC)
    ac_codes = _jpeg_canonical(*_JPEG_STD_AC)
    ref_codes = _jpeg_canonical(ref_counts, ref_syms)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab))
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, 1)
               + struct.pack(">BBB", 1, 0x11, 0))
    out += seg(0xC4, bytes([0x00]) + _JPEG_STD_DC[0] + _JPEG_STD_DC[1])
    out += seg(0xC4, bytes([0x10]) + _JPEG_STD_AC[0] + _JPEG_STD_AC[1])
    out += seg(0xC4, bytes([0x11]) + ref_counts + ref_syms)

    def sos(td_ta, ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, td_ta, ss, se, (ah << 4) | al]))

    # scan 1: DC first, full precision (Al=0)
    out += sos(0x00, 0, 0, 0, 0)
    w = _JpegBitWriter()
    pred = 0
    for blk in coef_blocks:
        diff = blk[0] - pred
        pred = blk[0]
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    w.align()
    out += w.out

    # scan 2: AC first at Al=1 — sign-magnitude point transform
    out += sos(0x00, 1, 63, 0, 1)
    w = _JpegBitWriter()
    for blk in coef_blocks:
        run = 0
        last = max((k for k in range(1, 64)
                    if abs(blk[k]) >> 1 != 0), default=0)
        for k in range(1, last + 1):
            v = blk[k]
            t = abs(v) >> 1
            if t == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                run -= 16
            s = t.bit_length()
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            mag = t if v >= 0 else -t
            w.put(mag if mag >= 0 else mag + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]
            w.put(code, ln)
    w.align()
    out += w.out

    # scan 3: AC refinement at Al=0 (correction bits + new coefs)
    out += sos(0x01, 1, 63, 1, 0)
    w = _JpegBitWriter()
    for blk in coef_blocks:
        run = 0
        br = []
        for k in range(1, 64):
            t = abs(blk[k])
            if t == 0:
                run += 1
                continue
            # ZRL flush must happen at ANY nonzero position (libjpeg
            # encode_mcu_AC_refine order) so buffered correction bits
            # never span past the 16-zero window the decoder walks
            while run >= 16:
                code, ln = ref_codes[0xF0]
                w.put(code, ln)
                for b in br:
                    w.put(b, 1)
                br = []
                run -= 16
            if t > 1:
                br.append(t & 1)
                continue
            # newly significant (|coef| == 1)
            code, ln = ref_codes[(run << 4) | 1]
            w.put(code, ln)
            w.put(1 if blk[k] > 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            run = 0
        code, ln = ref_codes[0x00]  # EOB run of 1
        w.put(code, ln)
        for b in br:
            w.put(b, 1)
    w.align()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_ac_refinement_matches_reference(spark):
    """Random coefficients through the successive-approximation AC
    scans (first at Al=1, refinement correction bits at Al=0) must
    reconstruct the SAME pixels as the direct IDCT of the full
    coefficients — validating EOBRUN, ZRL-with-corrections, newly-
    significant insertion, and history correction bits."""
    import numpy as np

    from duo_spark.operators.multimodal import _JPEG_ZIGZAG, _jpeg_reconstruct

    rng = np.random.RandomState(7)
    qtab = [(i % 8) + 1 for i in range(64)]
    blocks = []
    for _ in range(4):  # 16x16 grayscale
        blk = [0] * 64
        blk[0] = int(rng.randint(-200, 200))
        for _k in range(rng.randint(4, 16)):
            # include magnitude-1 coefs (newly significant in refine)
            blk[int(rng.randint(1, 64))] = int(rng.choice(
                [1, -1, *rng.randint(-255, 256, size=4).tolist()]))
        blocks.append(blk)
    blob = _encode_gray_progressive_ac(16, 16, blocks, qtab)
    w, h, got = _jpeg_reconstruct(blob)
    assert (w, h) == (16, 16)

    def ref_block(blk):
        C = np.zeros((8, 8))
        for i, pos in enumerate(_JPEG_ZIGZAG):
            C[pos // 8, pos % 8] = blk[i] * qtab[i]
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * C[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s
        return np.clip(np.floor(out + 128.0 + 0.5), 0, 255)

    want = np.zeros((16, 16))
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, 2)
        want[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = ref_block(blk)
    assert np.array_equal(got[:, :, 0].astype(float), want)


def test_g711_wav_decode(spark):
    """G.711 µ-law/A-law WAVs (format codes 7/6 — the stdlib wave
    reader rejects them) decode through the manual RIFF path with the
    ITU expand tables; known codec values pin the bit formulas."""
    from duo_spark.operators.multimodal import (
        _g711_table,
        _pcm16_mono,
        decode_wav,
        synth_wav_g711,
    )

    # published G.711 anchor points
    ul, al = _g711_table("ulaw"), _g711_table("alaw")
    assert int(ul[0xFF]) == 0 and int(ul[0x7F]) == 0      # +0 / -0
    assert int(ul[0x00]) == -32124 and int(ul[0x80]) == 32124
    assert int(al[0x55]) == -8 and int(al[0xD5]) == 8
    assert int(al[0x2A]) == -32256 and int(al[0xAA]) == 32256

    for law in ("ulaw", "alaw"):
        for mid in (0, 5, 63):
            blob = synth_wav_g711(mid, law)
            nch, rate, n, sa, pk = decode_wav(blob)
            tb = _g711_table(law)
            vals = [int(tb[(mid * 31 + i * 7) % 256])
                    for i in range(64 + mid % 64)]
            assert (nch, rate, n) == (1, 8000, len(vals))
            assert sa == sum(abs(v) for v in vals)
            assert pk == max(abs(v) for v in vals)
            # the envelope/FFT front end routes through the same path
            assert list(_pcm16_mono(blob)) == vals
