"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Design for 100 TB: binary payloads stay in parquet binary columns; decode /
feature-extract runs as mapInPandas over Arrow batches so bytes never
round-trip through Python row-at-a-time.  Partitioning is by payload-size
buckets (``repartitionByRange`` on n_bytes) so a few huge blobs cannot skew
one task.

The actual image/audio codecs are not available in this container, so
``decode_image`` is a clearly marked stub: the Spark-side plumbing (schema,
UDF signature, batch shape, partitioning) is real and tested with a
deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("mime", StringType()),
    ]
)

#: Decoded-feature output schema (what a real decoder would emit).
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap an arbitrary binary/string column as a multimodal record."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
    )


def real_decode(payload: bytes) -> tuple[int, int]:
    """Stub for the real codec path (Pillow/ffmpeg not in this container)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: derives (width, height) from content."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_media(df: DataFrame, decoder=fake_decode) -> DataFrame:
    """mapInPandas decode: Arrow batches in, typed features out.

    Size-bucketed repartition first so giant payloads spread across tasks.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            w, h, ck = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                ww, hh = decoder(b)
                w.append(ww)
                h.append(hh)
                ck.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "checksum": ck,
                }
            )

    return df.repartitionByRange("n_bytes").mapInPandas(batches, DECODED_SCHEMA)
