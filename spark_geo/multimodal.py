"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns + typed metadata structs;
heavy decode/feature work runs as Arrow-batched ``mapInPandas`` so a
real decoder drops in without touching the Spark plumbing.  The
decode step itself is STUBBED in this environment (no image/audio
libraries in the container): ``decoder="fake"`` produces a
deterministic, content-derived result so the batching / schema /
partitioning paths are real and testable; ``decoder="real"`` raises
NotImplementedError at the exact point a library call belongs.

Schemas, batch shapes and partitioning are production-shaped:
- media rows are large -> repartition by byte-size budget before
  decode (``repartition_by_bytes``)
- features come back as fixed-width array<float> columns, ready for
  spark_geo.vectors ANN ops
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def repartition_by_bytes(df: DataFrame, bytes_col_expr,
                         target_partition_bytes: int = 256 << 20) -> DataFrame:
    """Right-size partitions for large binary rows: estimate total
    bytes, repartition so each task holds ~target bytes (the media
    analogue of spark.sql.files.maxPartitionBytes)."""
    total = df.agg(F.sum(bytes_col_expr)).first()[0] or 0
    parts = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(parts)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic content-derived pseudo-feature (stand-in for a
    real decoder): sha256-seeded, unit-normalized."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    v = np.random.RandomState(seed).normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_image_features(df: DataFrame, *, id_col: str = "media_id",
                           payload_col: str = "payload", dim: int = 64,
                           decoder: str = "fake",
                           batch_target_bytes: int = 256 << 20) -> DataFrame:
    """binary payload -> feature vector, Arrow-batched.

    decoder='real' marks where PIL/libvips/ffmpeg calls belong —
    NotImplementedError in this container (libraries absent)."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    work = repartition_by_bytes(df.select(id_col, payload_col),
                                F.length(payload_col), batch_target_bytes)
    id_pos, pay_pos = 0, 1

    def run(batches):
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for mid, payload in zip(pdf.iloc[:, id_pos], pdf.iloc[:, pay_pos]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if decoder == "real":
                    raise NotImplementedError(
                        "image decode requires PIL/libvips — not present in "
                        "this container; plug the decoder in here")
                feat = _fake_decode(raw, dim)
                ids.append(int(mid))
                feats.append(feat.tolist())
                # fake deterministic dimensions from content
                ws.append(64 + raw[0] % 64 if raw else 64)
                hs.append(64 + (raw[-1] % 64) if raw else 64)
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "feature": pd.Series(feats, dtype=object),
                                "width": pd.Series(ws, dtype="int32"),
                                "height": pd.Series(hs, dtype="int32")})

    return work.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, *, id_col: str = "media_id",
                  payload_col: str = "payload", every_n: int = 10,
                  decoder: str = "fake") -> DataFrame:
    """Video -> sampled frame rows (1 per ``every_n``).  Fake decoder
    slices the payload deterministically; real decoding (ffmpeg) raises
    at the marked point.  Output explodes one row per frame — the
    shape downstream image ops consume."""
    work = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if decoder == "real":
                    raise NotImplementedError(
                        "video decode requires ffmpeg — not present; plug in here")
                n_frames = max(1, len(raw) // 100)
                for k in range(0, n_frames, every_n):
                    lo = (k * 100) % max(1, len(raw))
                    ids.append(int(mid))
                    idxs.append(k)
                    frames.append(raw[lo:lo + 100])
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_index": pd.Series(idxs, dtype="int32"),
                                "frame": pd.Series(frames, dtype=object)})

    return work.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_images(df: DataFrame, *, id_col: str = "media_id",
                  payload_col: str = "payload", width: int = 64,
                  height: int = 64, decoder: str = "fake") -> DataFrame:
    """Image -> fixed-size thumbnail rows.  The Spark plumbing (Arrow
    batches, byte-budget partitioning upstream, binary out) is real;
    the pixel work is a deterministic fake (payload resampled to
    width*height bytes by strided selection) — real decoding (PIL/
    opencv, absent in this container) raises at the marked point."""
    work = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            ids, outs = [], []
            for mid, payload in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if decoder == "real":
                    raise NotImplementedError(
                        "image decode/resample requires PIL/opencv — "
                        "not present; plug in here")
                n_out = width * height
                arr = np.frombuffer(raw or b"\x00", dtype=np.uint8)
                idx = (np.arange(n_out) * max(1, len(arr)) // n_out) % len(arr)
                ids.append(int(mid))
                outs.append(arr[idx].tobytes())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series([width] * len(ids), dtype="int32"),
                "height": pd.Series([height] * len(ids), dtype="int32"),
                "resized": pd.Series(outs, dtype=object)})

    return work.mapInPandas(run, schema=RESIZED_SCHEMA)


def synth_media(spark, n: int, media_type: str = "image",
                payload_bytes: int = 2048) -> DataFrame:
    """Deterministic synthetic media table (binary payload + metadata
    struct) for testing the plumbing at any scale."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.encode(F.format_string("%0" + str(payload_bytes) + "d", F.col("id")),
                 "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("synthetic").alias("format"),
            F.lit(128).alias("width"), F.lit(128).alias("height"),
            (F.col("id") % 60000).alias("duration_ms"),
        ).alias("meta"))
    return df
