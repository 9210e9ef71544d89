"""BPE merge induction — tokenizer-vocabulary training as aggregates.

Byte-pair encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") is the canonical
tokenizer-building step of an LLM data pipeline: repeatedly find the
most frequent adjacent symbol pair in the corpus and merge it into a
new symbol.

Scale shape — the reason BPE fits Spark well: training operates on
the WORD-FREQUENCY table, not the corpus. One pass reduces 100 TB of
text to O(|vocab|) (word, count) rows (hash aggregate, map-side
partials); every merge iteration is then an explode + hash aggregate
over that small table plus a 1-row collect (the argmax pair — the
only driver traffic, k rows total for k merges).

The merge step is pure literal-string Column work (whole-stage
codegen, oracle-replayable — no regex, no UDF): a word's symbol
sequence is kept as a space-joined string, and greedy left-to-right
non-overlapping pair replacement — exactly BPE's merge rule — falls
out of plain ``replace`` after doubling the separators:

    every boundary becomes TWO spaces; the pattern ``" x  y "``
    consumes one space from each side, leaving one for the adjacent
    match, so consecutive occurrences ("a a a a" with pair (a,a))
    merge exactly like BPE's scan ("aa aa"), which single-space
    replace gets wrong (its first match would eat the boundary the
    second needs). Collapse doubles and trim afterwards.

Ties in pair frequency break lexicographically (count desc, pair asc)
so training is deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_freq_table(
    df: DataFrame, text_col: str = "text", min_len: int = 2, max_len: int = 12
) -> DataFrame:
    """(word, cnt) over lowercased letter runs — the corpus reduction
    BPE trains on. ONE hash aggregate; everything after is O(vocab)."""
    words = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[^a-z]+")
        ).alias("word")
    )
    return (
        words.filter(
            (F.length("word") >= min_len) & (F.length("word") <= max_len)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _spaced(word) -> F.Column:
    """'hello' -> 'h e l l o' (symbol sequence as a string)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def merge_pair(sym, left: str, right: str) -> F.Column:
    """Greedy left-to-right BPE merge of (left, right) in the
    space-joined symbol string ``sym`` — the doubled-separator
    replace documented in the module docstring."""
    doubled = F.concat(
        F.lit(" "), F.replace(sym, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.replace(
        doubled,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def bpe_train(
    words: DataFrame, k: int = 3
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """``k`` BPE merges over a (word, cnt) table.

    Returns (final symbolized word table, merge list): the merge list
    is [(iteration, left, right, weighted pair count)], the artifact
    a tokenizer ships. One 1-row collect per iteration (the argmax
    pair) is the only driver traffic.
    """
    cur = words.select("cnt", _spaced(F.col("word")).alias("sym"))
    cur.cache()
    cur.count()
    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, k + 1):
        pairs = (
            cur.select("cnt", F.split("sym", " ").alias("a"))
            .filter(F.size("a") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(a) - 2),"
                        " i -> concat(element_at(a, i + 1), ' ',"
                        " element_at(a, i + 2)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
        )
        top = pairs.orderBy(F.col("total").desc(), F.col("pair")).limit(1).collect()
        if not top:
            break
        pair, total = top[0]["pair"], int(top[0]["total"])
        left, right = pair.split(" ")
        merges.append((it, left, right, total))
        nxt = cur.select("cnt", merge_pair(F.col("sym"), left, right).alias("sym"))
        nxt.cache()
        nxt.count()
        cur.unpersist()
        cur = nxt
    return cur, merges


def merges_df(spark: SparkSession, merges) -> DataFrame:
    """The merge list as a DataFrame (iteration, lhs, rhs, merged,
    pair_count) — k rows, the query-able training artifact. (lhs/rhs,
    not left/right: those are join keywords in every SQL dialect.)"""
    schema = T.StructType(
        [
            T.StructField("iteration", T.IntegerType(), False),
            T.StructField("lhs", T.StringType(), False),
            T.StructField("rhs", T.StringType(), False),
            T.StructField("pair_count", T.LongType(), False),
        ]
    )
    df = spark.createDataFrame(
        [(i, l, r, c) for i, l, r, c in merges], schema
    )
    return df.select(
        "iteration",
        "lhs",
        "rhs",
        F.concat("lhs", "rhs").alias("merged"),
        "pair_count",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 12,
    words: DataFrame | None = None,
) -> DataFrame:
    """Apply a shipped merge list to a corpus — the ENCODE half of the
    tokenizer (bpe_train learns the merges; this is what a data
    pipeline runs per document forever after): the post-merge
    vocabulary as ``(token, n)`` weighted by word frequency.

    Encoding replays the merges in training order on the word-frequency
    table, so the per-document cost is O(distinct words), not O(corpus)
    — the same reduction training uses, and the reason this stays two
    hash aggregates plus k literal `replace` passes (pure Column
    codegen) at any corpus size. Sennrich et al. 2016 §3: applying
    merges in learned order reproduces the training segmentation.

    Pass ``words`` (a precomputed/cached (word, cnt) table) to skip
    the corpus aggregate — a train-then-encode pipeline already has
    it.
    """
    if words is None:
        words = word_freq_table(df, text_col, min_len, max_len)
    sym = _spaced(F.col("word"))
    for _, left, right, _ in merges:
        sym = merge_pair(sym, left, right)
    return (
        words.select("cnt", F.explode(F.split(sym, " ")).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
    )
