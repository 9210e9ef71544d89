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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int | None = None,
    max_frames: int | None = None,
    with_hash: bool = False,
) -> DataFrame:
    """One-to-many media explode: split each payload into fixed-size
    byte frames (video frame-sampling / audio windowing plumbing).

    A real pipeline would decode frames with ffmpeg here
    (``sample_video_frames`` is the stubbed codec hook); the byte
    slicing below is the deterministic, library-free stand-in — the
    Arrow batch shape, the fan-out schema, and the bounded
    ``max_frames`` cap are the parts that carry over unchanged.
    Per-frame checksum = sum of frame bytes (exact, oracle-replayable);
    ``with_hash`` adds a per-frame md5 hex digest — the collision-safe
    identity that cross-asset frame dedup (:func:`duplicate_frames`)
    groups on.

    Scale: mapInPandas streams scan batches, each task emits only its
    own rows (no shuffle); the payload is dropped at this boundary so
    downstream aggregation never carries binary. ``max_frames`` bounds
    the fan-out of a pathological payload.
    """
    import hashlib

    import numpy as np

    step = stride or frame_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            sums: list[int] = []
            digs: list[str] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                arr = np.frombuffer(content, dtype=np.uint8)
                n_frames = max(1, -(-len(arr) // step)) if len(arr) else 0
                if max_frames is not None:
                    n_frames = min(n_frames, max_frames)
                for i in range(n_frames):
                    fr = arr[i * step : i * step + frame_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(fr))
                    sums.append(int(fr.sum()))
                    if with_hash:
                        digs.append(hashlib.md5(fr.tobytes()).hexdigest())
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(lens, dtype="int64"),
                "checksum": pd.Series(sums, dtype="int64"),
            }
            if with_hash:
                out["frame_md5"] = pd.Series(digs, dtype="object")
            yield pd.DataFrame(out)

    schema = FRAME_SCHEMA
    if with_hash:
        schema = T.StructType(
            [*FRAME_SCHEMA.fields, T.StructField("frame_md5", T.StringType(), False)]
        )
    return media.mapInPandas(run, schema)


def duplicate_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int | None = None,
    max_frames: int | None = None,
) -> DataFrame:
    """Cross-asset duplicate-frame report: per media item, how many of
    its frames also occur (byte-identical) in at least one OTHER item —
    the frame-hash near-dup detector of video pipelines (shared intro/
    outro/black frames), on the same sampled-frame plumbing.

    Shape: frame hashes from one mapInPandas pass (binary never
    shuffles); a (hash → min/max media) aggregate marks cross-asset
    hashes; a semi-join + per-media aggregate yields exact counts.
    Both shuffles are hash-partitioned on the frame digest — uniform
    by construction.

    Output: (media_id, n_frames, n_dup_frames, dup_ratio).
    """
    fr = sample_frames(media, frame_bytes, stride, max_frames, with_hash=True)
    dup = (
        fr.groupBy("frame_md5")
        .agg(F.min("media_id").alias("_mn"), F.max("media_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("frame_md5")
    )
    flagged = fr.join(dup, "frame_md5", "left_semi").groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_dup_frames")
    )
    per = fr.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        per.join(flagged, "media_id", "left")
        .select(
            "media_id",
            "n_frames",
            F.coalesce("n_dup_frames", F.lit(0)).alias("n_dup_frames"),
            F.round(
                F.coalesce("n_dup_frames", F.lit(0)) / F.col("n_frames"), 6
            ).alias("dup_ratio"),
        )
    )
