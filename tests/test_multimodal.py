"""Real multimodal codecs (round 10): stdlib WAV + BMP/PPM decode.

The plumbing operators (extract_features / sample_frames /
duplicate_frames / media_stats) are covered by their gate queries;
these tests pin the CODEC layer — container parsing, stride/padding
walks, channel order, and the exact-integer stat contract the
SQL oracles replay."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from duo_spark.operators.multimodal import (
    audio_stats,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_wav,
    image_stats,
    synth_bmp,
    synth_wav,
)


def _wav_bytes(samples, rate=8000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


# ------------------------------------------------------------------ WAV

def test_decode_wav_exact_stats():
    samples = [0, 100, -100, 32767, -32768, 5]
    nch, rate, n, sum_abs, peak = decode_wav(_wav_bytes(samples, rate=44100))
    assert (nch, rate, n) == (1, 44100, 6)
    assert sum_abs == 0 + 100 + 100 + 32767 + 32768 + 5
    assert peak == 32768  # |-32768|


def test_decode_wav_stereo_counts_both_channels():
    # interleaved L/R: n_samples counts frames x channels
    samples = [10, -20, 30, -40]  # 2 frames x 2 channels
    nch, rate, n, sum_abs, peak = decode_wav(_wav_bytes(samples, channels=2))
    assert nch == 2 and n == 4
    assert sum_abs == 100 and peak == 40


def test_decode_wav_rejects_non_pcm16():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # PCM8
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(buf.getvalue())


def test_decode_wav_rejects_garbage():
    with pytest.raises(Exception):
        decode_wav(b"not a riff container at all")


# ------------------------------------------------------------------ BMP

def _bmp_bytes(width, height, pixels, top_down=False):
    """pixels[(x, y)] = (r, g, b); real padding; bottom-up unless
    top_down (negative height)."""
    stride = (3 * width + 3) & ~3
    img_size = stride * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, width, -height if top_down else height, 1, 24, 0, img_size,
        0, 0, 0, 0,
    )
    ys = range(height) if top_down else range(height - 1, -1, -1)
    body = bytearray()
    for y in ys:
        for x in range(width):
            r, g, b = pixels[(x, y)]
            body += bytes((b, g, r))
        body += b"\x00" * (stride - 3 * width)
    return header + bytes(body)


def test_decode_bmp_padding_all_widths():
    # widths 1..4 exercise every 4-byte padding remainder
    for width in (1, 2, 3, 4, 5):
        px = {(x, y): (x + 1, 10 * (y + 1), 200) for x in range(width) for y in range(2)}
        w, h, sr, sg, sb = decode_bmp(_bmp_bytes(width, 2, px))
        assert (w, h) == (width, 2)
        assert sr == sum(p[0] for p in px.values())
        assert sg == sum(p[1] for p in px.values())
        assert sb == 200 * width * 2


def test_decode_bmp_top_down_negative_height():
    px = {(x, y): (x, y, x + y) for x in range(3) for y in range(3)}
    assert decode_bmp(_bmp_bytes(3, 3, px, top_down=True)) == decode_bmp(
        _bmp_bytes(3, 3, px)
    )


def test_decode_bmp_channel_order_not_swapped():
    # a pure-red image must sum into sum_r, not sum_b (BGR on disk)
    px = {(x, y): (255, 0, 0) for x in range(2) for y in range(2)}
    w, h, sr, sg, sb = decode_bmp(_bmp_bytes(2, 2, px))
    assert (sr, sg, sb) == (255 * 4, 0, 0)


def test_decode_ppm_p6_with_comment():
    raw = b"P6\n# a comment\n2 1\n255\n" + bytes((1, 2, 3, 4, 5, 6))
    assert decode_bmp(raw) == (2, 1, 1 + 4, 2 + 5, 3 + 6)


def test_decode_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="24-bit"):
        # 8bpp header
        hdr = struct.pack(
            "<2sIHHIIiiHHIIiiII",
            b"BM", 54, 0, 0, 54, 40, 1, 1, 1, 8, 0, 0, 0, 0, 0, 0,
        )
        decode_bmp(hdr)


# ------------------------------------------------- feature-vector hooks

def test_decode_audio_feature_vector():
    v = decode_audio(synth_wav(5))
    nch, rate, n, sum_abs, peak = decode_wav(synth_wav(5))
    assert v[:3] == [1.0, 8000.0, float(n)]
    assert v[3] == sum_abs / n and v[4] == float(peak)
    assert len(v) == 8 and v[5:] == [0.0, 0.0, 0.0]
    assert decode_audio(None) == [0.0] * 8


def test_decode_image_feature_vector():
    v = decode_image(synth_bmp(9))
    w, h, sr, sg, sb = decode_bmp(synth_bmp(9))
    assert v[:2] == [float(w), float(h)]
    assert v[2:5] == [sr / (w * h), sg / (w * h), sb / (w * h)]
    assert decode_image(None) == [0.0] * 8


# ------------------------------------------------- DataFrame operators

def test_audio_image_stats_operators(spark):
    rows = [(i, synth_wav(i), synth_bmp(i)) for i in range(20)]
    rows.append((99, None, None))  # NULL payloads are skipped
    df = spark.createDataFrame(
        rows, "media_id long, wav binary, bmp binary"
    )
    import pyspark.sql.functions as F

    a = {
        r.media_id: r
        for r in audio_stats(
            df.select("media_id", F.col("wav").alias("content"))
        ).collect()
    }
    assert len(a) == 20 and 99 not in a
    for i in range(20):
        nch, rate, n, sum_abs, peak = decode_wav(synth_wav(i))
        r = a[i]
        assert (r.n_channels, r.sample_rate, r.n_samples) == (nch, rate, n)
        assert (r.sum_abs, r.peak) == (sum_abs, peak)

    im = {
        r.media_id: r
        for r in image_stats(
            df.select("media_id", F.col("bmp").alias("content"))
        ).collect()
    }
    assert len(im) == 20
    for i in range(20):
        w, h, sr, sg, sb = decode_bmp(synth_bmp(i))
        r = im[i]
        assert (r.width, r.height, r.sum_r, r.sum_g, r.sum_b) == (w, h, sr, sg, sb)


def test_extract_features_real_codecs(spark):
    """decode_audio/decode_image now plug into the generic
    extract_features hook (the round-9 verdict's stub hooks are gone)."""
    from duo_spark.operators.multimodal import extract_features

    rows = [(i, "audio", synth_wav(i), None) for i in range(5)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, meta string",
    )
    out = {r.media_id: r for r in extract_features(df, decode_audio).collect()}
    for i in range(5):
        nch, rate, n, sum_abs, peak = decode_wav(synth_wav(i))
        feat = out[i].feature
        assert feat[2] == float(n)
        assert abs(feat[3] - sum_abs / n) < 1e-2  # float32 array rounding


# ----------------------------------------------- property tests (hypothesis)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=400,
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
        channels=st.integers(min_value=1, max_value=2),
    )
    def test_wav_roundtrip_property(samples, rate, channels):
        """Any PCM16 stream survives encode→decode with exact stats."""
        if channels == 2 and len(samples) % 2:
            samples = samples + [0]
        nch, r, n, sum_abs, peak = decode_wav(
            _wav_bytes(samples, rate=rate, channels=channels)
        )
        assert (nch, r, n) == (channels, rate, len(samples))
        assert sum_abs == sum(abs(s) for s in samples)
        assert peak == max(abs(s) for s in samples)

    @settings(max_examples=30, deadline=None)
    @given(
        width=st.integers(min_value=1, max_value=17),
        height=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=2**31),
        top_down=st.booleans(),
    )
    def test_bmp_roundtrip_property(width, height, seed, top_down):
        """Any 24-bit pixel grid survives encode→decode with exact
        channel sums at every padding remainder and row order."""
        import random

        rng = random.Random(seed)
        px = {
            (x, y): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for x in range(width)
            for y in range(height)
        }
        w, h, sr, sg, sb = decode_bmp(
            _bmp_bytes(width, height, px, top_down=top_down)
        )
        assert (w, h) == (width, height)
        assert sr == sum(p[0] for p in px.values())
        assert sg == sum(p[1] for p in px.values())
        assert sb == sum(p[2] for p in px.values())


# -- PNG (round 11: stdlib zlib inflate + per-scanline unfilter) --------


def _png_bytes(width, height, px, filters=None, color_type=2):
    """Hand-rolled PNG encoder for tests: arbitrary pixels, arbitrary
    per-row filter types (defaults to cycling all five)."""
    import struct
    import zlib

    ch = 4 if color_type == 6 else 3
    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            r, g, b = px[(x, y)]
            row += bytes((r, g, b) if ch == 3 else (r, g, b, (x * 7 + y) % 256))
        raw_rows.append(bytes(row))
    scan = bytearray()
    zero = bytes(width * ch)
    for y, cur in enumerate(raw_rows):
        f = (filters[y] if filters else y % 5)
        up = raw_rows[y - 1] if y > 0 else zero
        scan.append(f)
        for x in range(width * ch):
            a = cur[x - ch] if x >= ch else 0
            b = up[x]
            if f == 0:
                enc = cur[x]
            elif f == 1:
                enc = (cur[x] - a) % 256
            elif f == 2:
                enc = (cur[x] - b) % 256
            elif f == 3:
                enc = (cur[x] - ((a + b) >> 1)) % 256
            else:
                c = up[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (cur[x] - pred) % 256
            scan.append(enc)

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_synth_closed_form():
    """synth_png → decode_png reproduces the closed-form channel sums
    for assets spanning every (dims mod, filter mix) combination."""
    from duo_spark.operators.multimodal import decode_png, synth_png

    for mid in range(0, 63, 7):
        w, h, sr, sg, sb = decode_png(synth_png(mid))
        ew, eh = 8 + mid % 9, 8 + mid % 7
        grid = [(x, y) for x in range(ew) for y in range(eh)]
        assert (w, h) == (ew, eh)
        assert sr == sum((mid * 5 + x * 11 + y * 3) % 256 for x, y in grid)
        assert sg == sum((mid + x * 13 + y * 7) % 256 for x, y in grid)
        assert sb == sum((mid * 2 + x + y * 19) % 256 for x, y in grid)


def test_decode_png_each_filter_type_alone():
    """Each RFC 2083 filter type decodes exactly on its own (a
    cycling mix can mask a bug where one filter 'borrows' a
    neighbor's correct reconstruction)."""
    import random

    from duo_spark.operators.multimodal import decode_png

    rng = random.Random(3)
    px = {
        (x, y): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for x in range(11)
        for y in range(6)
    }
    want = (
        11,
        6,
        sum(p[0] for p in px.values()),
        sum(p[1] for p in px.values()),
        sum(p[2] for p in px.values()),
    )
    for f in range(5):
        got = decode_png(_png_bytes(11, 6, px, filters=[f] * 6))
        assert got == want, f


def test_decode_png_rgba_alpha_excluded():
    from duo_spark.operators.multimodal import decode_png

    px = {(x, y): (x, y, (x + y) % 256) for x in range(5) for y in range(4)}
    w, h, sr, sg, sb = decode_png(_png_bytes(5, 4, px, color_type=6))
    assert (w, h) == (5, 4)
    assert sr == sum(p[0] for p in px.values())
    assert sb == sum(p[2] for p in px.values())


def test_decode_png_dispatch_and_rejects():
    import struct
    import zlib

    import pytest

    from duo_spark.operators.multimodal import decode_bmp, decode_png, synth_png

    # decode_bmp dispatches on the PNG signature
    assert decode_bmp(synth_png(9)) == decode_png(synth_png(9))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a_nope")

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # palette color type is SUPPORTED since round 12 — but only with a
    # valid PLTE chunk; a bare palette header must still fail loud
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bad)
    # 16-bit palette is not a legal PNG combination — still rejected
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
    with pytest.raises(ValueError, match="depth"):
        decode_png(bad)
    # unknown interlace method (Adam7 itself is SUPPORTED since r12)
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)
    # truncated IDAT
    bad = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bad)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP2 = True
except ImportError:  # pragma: no cover
    HAVE_HYP2 = False

if HAVE_HYP2:

    @settings(max_examples=30, deadline=None)
    @given(
        width=st.integers(min_value=1, max_value=13),
        height=st.integers(min_value=1, max_value=8),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def test_png_roundtrip_property(width, height, seed):
        """Any 8-bit RGB grid survives encode→decode with exact sums
        under per-row filters drawn from the same seed."""
        import random

        from duo_spark.operators.multimodal import decode_png

        rng = random.Random(seed)
        px = {
            (x, y): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for x in range(width)
            for y in range(height)
        }
        filters = [rng.randrange(5) for _ in range(height)]
        w, h, sr, sg, sb = decode_png(_png_bytes(width, height, px, filters))
        assert (w, h) == (width, height)
        assert sr == sum(p[0] for p in px.values())
        assert sg == sum(p[1] for p in px.values())
        assert sb == sum(p[2] for p in px.values())


def test_avi_mjpeg_roundtrip_closed_form():
    """synth_avi_mjpeg -> decode_avi_mjpeg: the container walk finds
    every frame, the sampling stride holds, and each sampled frame's
    channel sums match the closed-form DC-only construction."""
    from duo_spark.operators.multimodal import decode_avi_mjpeg, synth_avi_mjpeg

    for mid in (0, 1, 2, 7, 11):
        avi = synth_avi_mjpeg(mid)
        w, h, n, frames = decode_avi_mjpeg(avi, every=2)
        assert (w, h) == (8 * (2 + mid % 3), 8 * (2 + mid % 2))
        assert n == 4 + mid % 3
        assert [f[0] for f in frames] == list(range(0, n, 2))
        for fidx, fw, fh, sr, sg, sb in frames:
            exp = sum(
                64 * ((mid * 29 + fidx * 19 + bx * 31 + by * 37) % 256)
                for bx in range(fw // 8)
                for by in range(fh // 8)
            )
            assert (fw, fh) == (w, h)
            assert sr == sg == sb == exp
        # every=1 yields all frames; the declared count matches
        assert len(decode_avi_mjpeg(avi, every=1)[3]) == n


def test_avi_mjpeg_bad_magic_and_every():
    import pytest as _pytest

    from duo_spark.operators.multimodal import decode_avi_mjpeg, synth_avi_mjpeg

    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"RIFX" + b"\x00" * 64)
    with _pytest.raises(ValueError, match="every"):
        decode_avi_mjpeg(synth_avi_mjpeg(0), every=0)


def test_video_stats_operator(spark):
    """video_stats: one row per sampled frame, payload dropped at the
    task boundary, exact integer sums."""
    from duo_spark.operators.multimodal import synth_avi_mjpeg, video_stats

    media = spark.createDataFrame(
        [(i, bytearray(synth_avi_mjpeg(i))) for i in range(4)] + [(99, None)],
        "media_id long, content binary",
    )
    rows = video_stats(media, every=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == {0, 1, 2, 3}  # NULL content skipped
    for mid, rs in by_media.items():
        n = 4 + mid % 3
        assert all(r.n_frames == n for r in rs)
        assert sorted(r.frame_idx for r in rs) == list(range(0, n, 2))
        assert all(r.sum_r == r.sum_g == r.sum_b for r in rs)


def test_decode_rgb_drop_in_decoder_passes_same_gates(spark):
    """The decode_rgb swap contract (VERDICT r12 #2): image_dhash
    driven by a drop-in decoder produces bit-identical hashes to the
    stdlib reference decoder — through the REAL Spark plan. The fake
    is a closure (cloudpickle ships it by value, like a user-supplied
    binding would arrive on executors)."""
    from duo_spark.operators.multimodal import image_dhash, synth_jpeg, synth_png

    def fake_native_decoder(buf):
        # stands in for a libjpeg-turbo binding: same contract,
        # different implementation path
        import numpy as np

        from duo_spark.operators.multimodal import decode_rgb

        w, h, px = decode_rgb(bytes(buf))
        return w, h, np.array(px, copy=True)

    media = spark.createDataFrame(
        [(i, bytearray(synth_jpeg(i))) for i in range(4)]
        + [(10 + i, bytearray(synth_png(i))) for i in (2, 4)],
        "media_id long, content binary",
    )
    ref = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    swp = {r.media_id: r.dhash
           for r in image_dhash(media, decoder=fake_native_decoder).collect()}
    assert swp == ref and len(ref) == 6
