"""Multimodal column plumbing (north-star).

Image/audio/video ride as opaque ``binary`` columns + typed metadata
structs. The Spark-side plumbing (schema, partition sizing, Arrow batch
shape, UDF signatures) is real and tested; the codec step itself is
STUBBED — the decode libraries (PIL/librosa/ffmpeg) are not in this
container, so ``decode_fn=None`` uses a deterministic fake that derives
"features" from the bytes, and passing a real decoder later changes no
plumbing.

Design for 100 TB: media bytes are large, so
- never groupBy/shuffle rows carrying the binary column; extract
  features first, then drop the payload;
- mapInPandas streams Arrow batches (bounded memory per task) instead
  of materializing whole partitions;
- `spark.sql.files.maxPartitionBytes` governs scan granularity — media
  tables should be written with row-group sizes matching it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row: payload + typed metadata (mirrors a typical lakehouse layout)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(content: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes -> tiny feature
    vector via a rolling byte hash. Replace with a real codec."""
    if content is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(content):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 997
    return [a / 997.0 for a in acc]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes | None], list[float]] | None = None,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode/feature-extract media rows via mapInPandas (Arrow batches).

    ``decode_fn`` is the pluggable codec (image decode + resize, audio
    resample, video frame-sample all share this signature). Real codecs
    raise NotImplementedError in this container; the default fake keeps
    the pipeline testable end to end.
    """
    fn = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)),
                    "feature": pdf["content"].map(fn),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def decode_image(content: bytes | None) -> list[float]:
    """Real image decode (PIL) — unavailable in this container."""
    raise NotImplementedError("image codec libs not available in this environment")


def decode_audio(content: bytes | None) -> list[float]:
    """Real audio decode (librosa/soundfile) — unavailable here."""
    raise NotImplementedError("audio codec libs not available in this environment")


def sample_video_frames(content: bytes | None, every_ms: int = 1000) -> list[float]:
    """Real video frame sampling (ffmpeg) — unavailable here."""
    raise NotImplementedError("video codec libs not available in this environment")


def media_stats(media: DataFrame) -> DataFrame:
    """Payload-free rollup: per kind, count/bytes percentiles. The
    binary column is projected away BEFORE the shuffle."""
    sizes = media.select(
        "kind", F.coalesce(F.octet_length("content"), F.lit(0)).alias("n_bytes")
    )
    return sizes.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.expr("percentile_approx(n_bytes, 0.5)").alias("p50_bytes"),
        F.expr("percentile_approx(n_bytes, 0.99)").alias("p99_bytes"),
    )
