"""Round-13 ADVICE fixes: doremi_weights' oracle-order summation +
engine-side rounding, ngram_diversity(approx)'s degenerate-level
inner-join semantics, collect_vector_matrix's per-row dim/NULL
validation, and the JPEG decoder's loud undefined-DQT/DHT errors."""

from __future__ import annotations

import pytest


def test_doremi_weights_sum_to_one_and_engine_rounded(spark):
    """The released mixture must still sum to ~1 after the summation
    reorder (sum shares, divide by steps once) and the engine-side
    F.round — and a domain with the only excess loss gets the largest
    weight."""
    from duo_spark.operators.selection import doremi_weights

    df = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 3.0)] * 5 + [("c", 2.0)] * 5,
        "source string, loss double",
    )
    rows = {r.source: r for r in doremi_weights(df).collect()}
    assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-4
    # global mean = 2.0 -> only b carries excess; a and c tie at zero
    assert rows["b"].weight > rows["c"].weight == rows["a"].weight
    assert rows["a"].excess == 0.0  # clipped at zero
    # 6-dp contract survives the engine-side rounding
    for r in rows.values():
        assert r.weight == round(r.weight, 6)


def test_ngram_diversity_approx_drops_empty_n_level(spark):
    """An n level with zero grams must DROP on the Spark side exactly
    as the SQL oracle's inner join of tot/est drops it — not surface a
    (total=0, distinct=NULL) row (r12 ADVICE)."""
    from duo_spark.operators.text import ngram_diversity

    # all_ngrams gives sub-n texts one whole-text gram, so only EMPTY
    # text produces a zero-gram level (the '' gram is filtered)
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    assert ngram_diversity(df, ns=(1, 2, 3), approx=True).count() == 0
    # sanity: a non-degenerate corpus still reports every level
    ok = spark.createDataFrame([("a b",)], "text string")
    out = {r.n: r for r in
           ngram_diversity(ok, ns=(1, 2), approx=True).collect()}
    assert out[1].total_ngrams == 2 and out[2].total_ngrams == 1


def test_collect_vector_matrix_ragged_row_past_first_is_loud(spark):
    """A ragged vector past row 1 must raise the documented ValueError,
    not fall through to an object-dtype matrix (r12 ADVICE)."""
    from duo_spark.operators.util import collect_vector_matrix

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "id long, vec array<double>",
    ).coalesce(1).sortWithinPartitions("id")
    with pytest.raises(ValueError, match="ragged"):
        collect_vector_matrix(df, "id", "vec", max_rows=10)


def test_collect_vector_matrix_null_row_past_first_is_loud(spark):
    from duo_spark.operators.util import collect_vector_matrix

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)],
        "id long, vec array<double>",
    ).coalesce(1).sortWithinPartitions("id")
    with pytest.raises(ValueError, match="NULL"):
        collect_vector_matrix(df, "id", "vec", max_rows=10)


def test_jpeg_undefined_dht_raises_value_error():
    """A SOS referencing a Huffman table id that no DHT defined must
    raise the decoder's documented ValueError, not a bare KeyError
    (r12 ADVICE)."""
    import struct

    from duo_spark.operators.multimodal import _jpeg_reconstruct

    parts = [b"\xff\xd8"]
    # DQT tq=0, all-8s
    parts.append(b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x08" * 64)
    # SOF0: 8-bit, 8x8, 1 component (id=1, hv=1x1, tq=0)
    parts.append(
        b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    # SOS referencing DC table 5 / AC table 5 — never defined
    parts.append(
        b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x55, 0, 63, 0])
    )
    parts.append(b"\x00\xff\xd9")
    with pytest.raises(ValueError, match="undefined DHT id 5"):
        _jpeg_reconstruct(b"".join(parts))


def test_jpeg_undefined_dqt_raises_value_error():
    """A component whose SOF quant-table id no DQT defined must raise
    ValueError at dequant, not KeyError (r12 ADVICE). Built by patching
    a valid synthetic JPEG's SOF0 tq byte to an undefined id."""
    from duo_spark.operators.multimodal import _jpeg_reconstruct, synth_jpeg

    buf = bytearray(synth_jpeg(0))
    sof = buf.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 data layout: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]...
    tq_off = sof + 2 + 2 + 6 + 2  # first component's tq byte
    buf[tq_off] = 3
    with pytest.raises(ValueError, match="undefined DQT id 3"):
        _jpeg_reconstruct(bytes(buf))
