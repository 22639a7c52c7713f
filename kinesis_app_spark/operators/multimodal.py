"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched mapInPandas.

This mirrors the reference's core data model — an opaque record blob the
framework never interprets (Record payload, src/Kinesis/Kinesis.hs:59;
handed untouched to the user Processor, src/Kinesis/Coordination.hs:51-53)
— upgraded to a first-class column: `payload: binary` plus a typed
metadata struct, so Catalyst can prune/pushdown on metadata without ever
deserializing payload bytes.

The actual image/audio decode libraries are not in this container, so the
decode kernels are STUBS: `decode_payload` raises NotImplementedError for
real modalities and provides a deterministic fake ("bytes" modality) that
exercises the full Spark plumbing — schema, Arrow batch shape,
partitioning — for real.

Scale notes: payloads travel Arrow-batched (spark.sql.execution.arrow.*),
metadata-only queries never touch payload bytes (column pruning), and
per-file payload skew is handled by repartitioning on a hash of the id
before the expensive decode stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_app_spark.operators.util import spread

#: modalities with a real decoder available in this environment
FAKE_MODALITIES = {"bytes"}

PAYLOAD_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata —
    the ingest shape a real image/audio table would have."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit("bytes").alias("modality"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def decode_payload(modality: str) -> None:
    """Entry point a real deployment would route through. Image/audio/video
    decoders (PIL, torchaudio, ffmpeg) are not installed here."""
    if modality not in FAKE_MODALITIES:
        raise NotImplementedError(
            f"decoder for modality {modality!r} not available in this "
            "container; only the deterministic 'bytes' fake is wired up"
        )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The kernel is where image-resize / audio-resample / frame-sample would
    run; the fake computes deterministic features (length, md5, head bytes)
    so the batch shape and schema handling are tested for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return spread(df.select(id_col, "payload")).mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """'Frame sampling' fake: emit one row per sampled offset of the payload
    (what video frame extraction looks like shape-wise: one input row ->
    many output rows, Arrow-batched)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_off, out_b = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(b)
                for off in range(0, len(raw), every_n_bytes):
                    out_id.append(i)
                    out_off.append(off)
                    out_b.append(raw[off])
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_offset": out_off, "first_byte": out_b}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_offset", T.LongType()),
            T.StructField("first_byte", T.IntegerType()),
        ]
    )
    return spread(df.select(id_col, "payload")).mapInPandas(kernel, schema)
