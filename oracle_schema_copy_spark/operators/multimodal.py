"""Multimodal (binary) column operators.

Images/audio/video are opaque ``binary`` columns plus typed metadata, the
same LOB story as the reference (CLOB→String, BLOB→byte[],
``CopyUtils.java:100-104,735-739``) but columnar: binary payloads travel
through parquet/operation-log like any other column.

The decode step (image decode, audio resample, video frame extraction)
needs codec libraries that are NOT in this environment — it is stubbed
behind ``decode_stub``: a clearly-marked deterministic fake whose
*plumbing* (schema contract, Arrow batching, partition behavior) is real
and tested. Swap ``_fake_decode`` for PIL/ffmpeg in production; nothing
else changes.

Scale notes: feature extraction is ``mapInPandas`` (Arrow-batched, no
row-at-a-time Python); binary payloads respect ``maxRecordsPerFile`` so
parquet files stay balanced even with large blobs; frame sampling is an
explode of computed offsets — rows multiply, bytes do not (offsets only).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive the opaque binary payload + typed metadata columns (the test
    fixtures carry text; a real pipeline reads image/audio bytes here)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
            F.upper(F.hex(F.substring(payload, 1, 4))).alias("magic"),
        ),
    )


def frame_offsets(
    df: DataFrame, *, id_col: str = "doc_id", bytes_per_frame: int = 10, stride: int = 5
) -> DataFrame:
    """Video-style frame sampling: every ``stride``-th frame index of a
    payload treated as fixed-size frames; returns (id, frame_idx,
    byte_offset) — offsets only, the payload bytes are not duplicated."""
    n_frames = F.floor(F.octet_length(F.col("payload")) / bytes_per_frame).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(stride))
    return (
        df.filter(n_frames > 0)
        .select(F.col(id_col), F.explode(idx).alias("frame_idx"))
        .select(
            id_col,
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * bytes_per_frame).cast("long").alias("byte_offset"),
        )
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder: pretends the payload is
    a (width x height x channels) image and emits hash-derived features.
    DO NOT use beyond tests — replace with a real codec."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 16
    height = 16 + digest[1] % 16
    channels = 3
    # b/256 is a dyadic rational: exactly representable in float32, and
    # reproducible bit-for-bit by any engine computing byte/256 (the SQL
    # oracle derives the same bytes from the sha256 hex digest).
    feats = [b / 256.0 for b in digest[2 : 2 + FEATURE_DIM]]
    return width, height, channels, feats


def extract_features(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload", real: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real=True`` raises NotImplementedError: codec libraries (PIL/
    torchvision/ffmpeg) are not available in this environment. The
    ``mapInPandas`` plumbing — schema, batching, per-partition iteration —
    is the production shape either way.
    """
    if real:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this environment; use real=False for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
    real: bool = False,
) -> DataFrame:
    """Arrow-batched image resize/thumbnail over binary payloads — the
    fourth member of the decode / feature-extract / resize / frame-sample
    quartet. Source dimensions come from the stub decoder; the "resized"
    thumbnail is identified by a digest deterministically derived from
    (payload sha256, target dims), so the SQL oracle can re-derive every
    output column without any codec. Exact doubles: ``scale = out/in``
    is one IEEE division of small ints on both engines.

    ``real=True`` raises (no codec libraries here); the ``mapInPandas``
    plumbing — schema, Arrow batches, per-partition iteration — is the
    production shape either way; swap the body for PIL's ``thumbnail``.
    """
    if real:
        raise NotImplementedError(
            "real image resize requires codec libraries not present in "
            "this environment; use real=False for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, _, _ = _fake_decode(p)
                hx = hashlib.sha256(p).hexdigest()
                rows.append(
                    (
                        int(i), w, h, out_w, out_h,
                        out_w / w, out_h / h,
                        hashlib.md5(f"{hx}|{out_w}x{out_h}".encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "in_w", "in_h", "out_w", "out_h",
                    "scale_x", "scale_y", "thumb_md5",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


def extract_features_arrow(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: identical stub
    decode, but the batch iterator stays in pyarrow RecordBatch form —
    no pandas materialization per batch. For decode-style workloads the
    payload bytes go straight from Arrow buffers into the codec and the
    features come back as an Arrow array, skipping the pandas object
    boxing entirely — the lower-overhead production path when the UDF
    body does not need pandas semantics. Output is bit-identical to the
    pandas path (pytest-pinned)."""
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            payloads = batch.column(batch.schema.get_field_index(payload_col))
            decoded = [_fake_decode(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array([d[0] for d in decoded], pa.int32()),
                    pa.array([d[1] for d in decoded], pa.int32()),
                    pa.array([d[2] for d in decoded], pa.int32()),
                    pa.array([d[3] for d in decoded], pa.list_(pa.float32())),
                ],
                names=["doc_id", "width", "height", "n_channels", "features"],
            )

    return df.select(id_col, payload_col).mapInArrow(run, FEATURE_SCHEMA)
