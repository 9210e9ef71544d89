"""Unit tests for scalar codecs (SURVEY §2.8).

The timing-format table replicates the reference's own unit tests
(duo/src/models.rs:197-214) and the duration parser mirrors
duo/src/web/deser.rs:241-252.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duo_spark.functions import (
    format_timing,
    level_from_int,
    level_to_int,
    parse_duration_us,
    tags_from_json,
    tags_to_json,
    timestamp_from_us,
    us_from_timestamp,
)


@pytest.mark.parametrize(
    ("us", "expected"),
    [
        (3, "3us"),
        (303, "303us"),
        (3_030, "3.03ms"),
        (3_300, "3.30ms"),
        (3_000_000, "3.00s"),
        (3_300_000, "3.30s"),
        (999, "999us"),
        (1_000, "1.00ms"),
        (999_999, "1000.00ms"),
        (1_000_000, "1.00s"),
    ],
)
def test_format_timing(spark, us, expected):
    row = spark.range(1).select(format_timing(F.lit(us)).alias("t")).first()
    assert row["t"] == expected


@pytest.mark.parametrize(
    ("text", "expected"),
    [("100us", 100), ("100ms", 100_000), ("1s", 1_000_000), ("1.5ms", 1_500), ("bogus", None)],
)
def test_parse_duration(text, expected):
    assert parse_duration_us(text) == expected


def test_timestamp_roundtrip(spark):
    us = 1_654_963_200_123_456
    row = (
        spark.range(1)
        .select(us_from_timestamp(timestamp_from_us(F.lit(us))).alias("us"))
        .first()
    )
    assert row["us"] == us


def test_level_codec(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "lvl int")
    rows = df.select(
        level_from_int("lvl").alias("s"), level_to_int(level_from_int("lvl")).alias("i")
    ).collect()
    assert [r["s"] for r in rows] == ["ERROR", "WARN", "INFO", "DEBUG", "TRACE"]
    assert [r["i"] for r in rows] == [1, 2, 3, 4, 5]


def test_tags_json_roundtrip(spark):
    df = spark.createDataFrame([({"busy": "1.20ms", "idle": "3us"},)], "tags map<string,string>")
    back = df.select(tags_from_json(tags_to_json("tags")).alias("m")).first()["m"]
    assert back == {"busy": "1.20ms", "idle": "3us"}


# ------------------------------------------------- property tests --

from hypothesis import given, settings
from hypothesis import strategies as st

from duo_spark.functions.time import format_timing_py, parse_duration_us


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10**13))
def test_format_then_parse_roundtrips_within_format_precision(us):
    """parse(format(x)) must recover x up to the 2-decimal rendering
    precision of the formatted unit (exact below 1 ms)."""
    s = format_timing_py(us)
    back = parse_duration_us(s)
    assert back is not None, s
    if us < 1_000:
        assert back == us
    elif us < 1_000_000:
        assert abs(back - us) <= 5  # 0.005 ms rendering granularity
    else:
        assert abs(back - us) <= 5_000  # 0.005 s


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.sampled_from(["us", "µs", "ms", "s"]),
)
def test_parse_duration_unit_table(n, unit):
    mult = {"us": 1, "µs": 1, "ms": 1_000, "s": 1_000_000}[unit]
    assert parse_duration_us(f"{n}{unit}") == n * mult


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=12))
def test_parse_duration_never_raises(s):
    r = parse_duration_us(s)
    assert r is None or isinstance(r, int)


def test_top_ngrams_counts_and_tiebreak(spark):
    from duo_spark.operators.text import top_ngrams

    docs = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("z",)], "text string"
    )
    got = [(r.ngram, r["count"]) for r in top_ngrams(docs, "text", n=2, k=10).collect()]
    # 'a b' x3 ('a b a b' holds two: 'a b','b a','a b'), then lexicographic
    assert got == [("a b", 3), ("b a", 1), ("b c", 1), ("z", 1)]


def test_corpus_mixture_manual(spark):
    from duo_spark.operators.text import corpus_mixture

    docs = spark.createDataFrame(
        [
            (1, "a", "Hello  world", 12),
            (2, "a", "hello world", 11),   # dup of 1 after normalize
            (3, "a", "three word doc", 14),
            (4, "b", "solo", 4),
        ],
        "doc_id long, source string, text string, n_chars long",
    )
    got = {r.source: r for r in corpus_mixture(docs, "source").collect()}
    a = got["a"]
    assert (a.n_docs, a.n_unique) == (3, 2)
    assert a.dup_rate == round(1 - 2 / 3, 6)
    assert a.doc_share == 0.75
    assert a.total_tokens == 2 + 2 + 3
    assert a.p50_chars == 12.0  # median of 12, 11, 14
    b = got["b"]
    assert (b.n_docs, b.n_unique, b.dup_rate, b.doc_share) == (1, 1, 0.0, 0.25)


def test_chunk_documents_boundaries(spark):
    from duo_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three tokens"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # doc 1: step 3 -> starts 0,3,6,9 (ceil(10/3)=4 chunks)
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, "t6 t7 t8 t9")
    assert got[(1, 3)] == (1, "t9")
    assert got[(2, 0)] == (3, "only three tokens")
    assert (2, 1) not in got
    # empty doc -> one chunk holding the single empty token
    assert got[(3, 0)][0] == 1


def test_rolling_features_two_pointer_semantics(spark):
    from duo_spark.operators.features import rolling_window_features

    ev = spark.createDataFrame(
        [(1, 0, 10), (1, 50, 20), (1, 100, 30), (1, 161, 40), (2, 0, 5)],
        "user_id long, t_us long, v long",
    )
    got = {
        (r.user_id, r.t_us): (r.n_win, r.sum_win)
        for r in rolling_window_features(ev, "user_id", "t_us", "v", window_us=100).collect()
    }
    assert got[(1, 0)] == (1, 10.0)
    assert got[(1, 50)] == (2, 30.0)
    assert got[(1, 100)] == (3, 60.0)   # [0,100] inclusive both ends
    assert got[(1, 161)] == (2, 70.0)   # [61,161] holds only t=100 and t=161
    assert got[(2, 0)] == (1, 5.0)


def test_gopher_rules_flags(spark):
    from duo_spark.operators.text import gopher_rules

    fluent = "the quick brown fox jumps over a lazy dog and it runs to the hills " * 5
    repetitive = "spam ham spam ham " * 30
    short = "too short"
    docs = spark.createDataFrame(
        [(1, fluent), (2, repetitive), (3, short)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs, min_tokens=20).collect()}
    assert got[1].keep
    assert not any(
        [got[1].too_short, got[1].too_long, got[1].bad_token_len,
         got[1].low_stopword, got[1].high_punct, got[1].too_repetitive]
    )
    assert got[2].too_repetitive and got[2].low_stopword and not got[2].keep
    assert got[3].too_short and not got[3].keep


def test_chunk_documents_reconstruction_invariant(spark):
    """For ANY document, dropping each non-first chunk's first
    ``overlap`` tokens and concatenating in chunk order must
    reconstruct the original token sequence exactly — the lossless
    property context-packing relies on."""
    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(0, 57))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from duo_spark.operators.text import chunk_documents

    chunk_tokens, overlap = 16, 4
    step = chunk_tokens - overlap
    out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        orig = text.split() if text.strip() else [""]
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        rebuilt: list[str] = []
        for r in rows:
            toks = r.chunk_text.split(" ") if r.chunk_text != "" else [""]
            assert len(toks) == r.n_tokens, (doc_id, r.chunk_idx)
            rebuilt.extend(toks if r.chunk_idx == 0 else toks[overlap:])
        # the trailing chunk may be shorter than overlap only when it
        # is the document tail; reconstruction must still be exact
        assert rebuilt == orig, (doc_id, len(rebuilt), len(orig))
        # chunk starts advance by step
        for k, r in enumerate(rows):
            assert r.chunk_idx == k


def test_canonical_url(spark):
    """functions/url.py canonical_url: scheme/host case, default
    ports, fragments, tracking params, param order, trailing slash."""
    from pyspark.sql import functions as F

    from duo_spark.functions.url import canonical_url

    cases = {
        "HTTPS://Example.COM:443/p/1/?utm_source=x&b=2&a=1#f":
            "https://example.com/p/1?a=1&b=2",
        "https://example.com/p/1?a=1&b=2": "https://example.com/p/1?a=1&b=2",
        "http://Example.com:80/": "http://example.com/",
        "https://example.com:8443/x?gclid=1&fbclid=2&ref=z":
            "https://example.com:8443/x",
        "ftp://Files.Example.com/Pub/": "ftp://files.example.com/Pub",
        "not a url": None,
        # round 8 — RFC 3986 §6.2.2: unreserved escapes decode,
        # retained escapes get uppercase hex, invalid escapes pass
        "https://example.com/%7Euser/a%2fb?x=%41%3d1":
            "https://example.com/~user/a%2Fb?x=A%3D1",
        "https://example.com/100%zz": "https://example.com/100%zz",
        "https://ex%41mple.com/x": "https://example.com/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r.u: r.c for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()}
    assert got == cases


@settings(max_examples=30, deadline=None)
@given(
    urls=st.lists(
        st.builds(
            lambda scheme, host, port, path, params, frag: (
                f"{scheme}://{host}{port}{path}"
                + ("?" + "&".join(params) if params else "")
                + frag
            ),
            st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
            st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,8}\.){1,2}[A-Za-z]{2,4}", fullmatch=True),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.from_regex(
                r"(/([A-Za-z0-9._~-]|%[0-9A-Fa-f]{2}|%z){0,6}){0,3}/?",
                fullmatch=True,
            ),
            st.lists(
                st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9]{0,4}", fullmatch=True),
                max_size=4,
            ),
            st.sampled_from(["", "#frag", "#a/b"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_canonical_url_idempotent(spark, urls):
    """The defining canonicalizer property: canon(canon(u)) ==
    canon(u) for generated scheme/host/port/path/param/fragment
    combinations — one Spark job per hypothesis example over the
    whole batch."""
    from pyspark.sql import functions as F

    from duo_spark.functions.url import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, r


def test_canonical_url_idn_fold(spark):
    """fold_idn=True: non-ASCII hosts punycode-fold (RFC 3490 ToASCII)
    so unicode and xn-- spellings share a dedup key; ASCII hosts stay
    on the codegen path; the fold is idempotent."""
    from pyspark.sql import functions as F

    from duo_spark.functions.url import canonical_url

    cases = {
        "https://B\u00fcCHER.example/x": "https://xn--bcher-kva.example/x",
        "https://xn--bcher-kva.example/x": "https://xn--bcher-kva.example/x",
        "https://plain.example/x": "https://plain.example/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r.u: r.c
        for r in df.select(
            "u", canonical_url(F.col("u"), fold_idn=True).alias("c")
        ).collect()
    }
    assert got == cases
    out = df.select(
        canonical_url(F.col("u"), fold_idn=True).alias("c1"),
        canonical_url(
            canonical_url(F.col("u"), fold_idn=True), fold_idn=True
        ).alias("c2"),
    ).collect()
    assert all(r.c1 == r.c2 for r in out)
