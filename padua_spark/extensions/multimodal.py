"""Multimodal (image/audio/video) column plumbing.

Design for 100 TB media corpora: media are opaque ``binary`` columns
with typed metadata alongside (the Parquet/Delta pattern); decode and
feature-extraction run as **Arrow-batched ``mapInPandas``** stages so
bytes cross the Python boundary once per batch, not per row, and the
pipeline parallelizes per partition with no shuffle.

The actual codec calls are STUBBED in this environment (no
PIL/ffmpeg/librosa in the container): ``decode_image`` raises
``NotImplementedError`` unless a decoder is injected, and
``fake_decode`` provides a deterministic stand-in so the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested.
"""

from __future__ import annotations

import sys
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# mapInPandas closures below reference this module's helpers; executor
# workers may not have the repo on sys.path (see
# functions/distributions.py) — serialize the module by value.
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_hash", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_MOD = 2147483647


def decode_image(content: bytes, decoder: Callable | None = None):
    """Decode an image byte payload. No image library ships in this
    container — inject ``decoder`` (e.g. PIL.Image.open) in a real
    deployment."""
    if decoder is None:
        raise NotImplementedError(
            "no image decoder available in this environment; inject one"
        )
    return decoder(content)


def fake_decode(content: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for decode+embed: polynomial byte hashes
    over ``n_features`` strides. Purely for exercising the plumbing."""
    out = []
    for k in range(n_features):
        acc = k + 1
        for b in content[k::n_features]:
            acc = (acc * 131 + b) % _MOD
        out.append(acc / _MOD)
    return out


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    n_features: int = 8,
    batch_size_conf: str | None = "10000",
) -> DataFrame:
    """Feature extraction as a ``mapInPandas`` stage: one Arrow batch in,
    one feature frame out; no shuffle, scales linearly with partitions.

    With a real decoder the body is the only place that changes — the
    schema, batching and distribution stay as tested here.
    """
    spark = media.sparkSession
    if batch_size_conf:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", batch_size_conf
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf[content_col]
            n_bytes = contents.map(lambda b: len(b) if b is not None else 0)
            byte_hash = contents.map(
                lambda b: _poly_bytes(b) if b is not None else None
            )
            feats = contents.map(
                lambda b: fake_decode(b, n_features)
                if b is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_hash": byte_hash,
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def _poly_bytes(b: bytes) -> int:
    acc = 0
    for x in b:
        acc = (acc * 131 + x) % _MOD
    return acc


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plumbing: explode each media row into its
    sample timestamps (decode stubbed). The explode happens JVM-side;
    only the (id, ts) pairs reach the decoder stage."""
    n = (F.col(duration_col) / F.lit(every_ms)).cast("int")
    return media.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))


def audio_chunk_plan(
    media: DataFrame,
    chunk_ms: int = 30_000,
    hop_ms: int = 15_000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Audio chunking plumbing: explode each track into overlapping
    (start, end) windows — the standard front-end before ASR /
    embedding models (30 s chunks, 50 % hop). JVM-side ``sequence`` +
    ``explode``; only (id, chunk bounds) rows reach the decode stage,
    the waveform bytes stay in their partition until the mapInPandas
    decoder (stubbed here) slices them.

    A final short chunk is emitted iff at least 1 ms of audio remains
    past the last full hop (no zero-length chunks); tracks shorter
    than one chunk produce exactly one chunk."""
    dur = F.col(duration_col).cast("bigint")
    n_hops = F.greatest(
        F.ceil((dur - F.lit(chunk_ms)) / F.lit(hop_ms)).cast("bigint"),
        F.lit(0),
    )
    return (
        media.select(
            F.col(id_col),
            dur.alias("_dur"),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_hops)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * F.lit(hop_ms)).alias("start_ms"),
            F.least(
                F.col("chunk_idx") * F.lit(hop_ms) + F.lit(chunk_ms),
                F.col("_dur"),
            ).alias("end_ms"),
        )
        .where(F.col("end_ms") > F.col("start_ms"))
    )


def extract_audio_features(
    media: DataFrame,
    n_features: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
    extractor: Callable | None = None,
) -> DataFrame:
    """Audio feature extraction as ``mapInPandas`` (MFCC-shaped stub):
    with ``extractor=None`` the deterministic fake splits the payload
    into ``n_features`` byte stripes and polynomial-hashes each into
    [0, 1) — the Spark-side plumbing (Arrow batches, array<double>
    schema, partition-local execution) is real; a deployment injects
    ``extractor(bytes) -> list[float]`` (e.g. librosa MFCC means) and
    nothing else changes."""

    def _features(b):
        if b is None:
            return None
        if extractor is not None:
            return [float(x) for x in extractor(bytes(b))]
        bb = bytes(b)
        stripe = max(1, len(bb) // n_features)
        out = []
        for i in range(n_features):
            seg = bb[i * stripe : (i + 1) * stripe]
            out.append(_poly_bytes(seg) / _MOD)
        return out

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "features": pdf[content_col].map(_features),
                }
            )

    return media.mapInPandas(_run, "media_id bigint, features array<double>")


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adapter for tests: treat UTF-8 text bytes as opaque media
    content (the container has no real image/audio fixtures)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def resize_media(
    media: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    content_col: str = "content",
    resizer: Callable | None = None,
) -> DataFrame:
    """Resize stage as ``mapInPandas``: binary in → binary out, so it
    composes with :func:`extract_features` in one pipeline with no
    shuffle between stages.

    No image library ships in this container: with ``resizer=None`` a
    deterministic fake "resize" truncates/zero-pads the payload to
    ``target_w*target_h`` bytes — the Spark-side plumbing (schema,
    Arrow batching, binary columns, partition-local execution) is real
    and tested; a real deployment injects
    ``resizer(content, w, h) -> bytes`` (e.g. PIL thumbnail + re-encode)
    and nothing else changes.
    """
    n_out = target_w * target_h

    def _resize_bytes(b):
        if b is None:
            return None
        if resizer is not None:
            return resizer(b, target_w, target_h)
        return bytes(b[:n_out]).ljust(n_out, b"\x00")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": pdf[content_col].map(_resize_bytes),
                    "width": target_w,
                    "height": target_h,
                }
            )

    schema = (
        "media_id bigint, content binary, width int, height int"
    )
    return media.mapInPandas(_run, schema)
