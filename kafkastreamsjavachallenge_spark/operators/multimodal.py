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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry geometry (baseline, extended
# sequential, progressive, lossless, and their differential/arithmetic
# variants) — every marker in 0xC0-0xCF except DHT/JPG/DAC.
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def real_decode(payload: bytes) -> tuple[int, int]:
    """Header-only image geometry: parses PNG IHDR and JPEG SOF markers
    with pure byte arithmetic — no codec library needed, so the 'real'
    path works even in codec-free containers.  Full pixel decode
    (Pillow/ffmpeg) still does not exist here; anything that is neither
    a PNG nor a JPEG raises NotImplementedError so callers cannot
    mistake the stub for a universal decoder.

    PNG: the 8-byte signature is followed by the IHDR chunk whose data
    starts at byte 16 — width and height are the two big-endian u32 at
    bytes 16-23 (PNG spec, RFC 2083 §4.1.1).
    JPEG: scan the marker stream (0xFF id len payload); any SOFn marker
    carries [precision u8][height u16][width u16] at payload offset 1
    (ITU-T T.81 §B.2.2)."""
    if payload.startswith(_PNG_MAGIC) and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        if w > 0 and h > 0:
            return w, h
        raise ValueError(f"corrupt PNG IHDR: width={w} height={h}")
    if payload[:2] == b"\xff\xd8":  # SOI
        i = 2
        n = len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                break  # desynced marker stream
            marker = payload[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    if w > 0 and h > 0:
                        return w, h
                raise ValueError("corrupt JPEG SOF segment")
            if seg_len < 2:
                break
            i += 2 + seg_len
        raise ValueError("JPEG with no SOF marker before scan data")
    raise NotImplementedError(
        "real_decode parses PNG/JPEG headers only; pixel-level codecs "
        "(Pillow/ffmpeg) are not available in this environment — "
        "use fake_decode for synthetic payloads"
    )


def real_decode_audio(payload: bytes) -> tuple[int, int, int, int]:
    """Header-only audio geometry for RIFF/WAVE: (sample_rate, channels,
    bits_per_sample, n_samples) from the fmt and data chunks — pure byte
    arithmetic (RIFF spec: little-endian [id u32][size u32] chunk stream
    after the 12-byte RIFF/WAVE preamble; fmt carries channels at +2,
    sample rate at +4, bits/sample at +14).  Compressed codecs (mp3/aac)
    need a real decoder and raise NotImplementedError, mirroring
    ``real_decode``'s honest-stub contract."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "real_decode_audio parses RIFF/WAVE headers only; compressed "
            "audio codecs are not available in this environment"
        )
    i, n = 12, len(payload)
    rate = ch = bits = None
    n_samples = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data" and ch and bits:
            n_samples = size // max(1, ch * (bits // 8))
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not (rate and ch and bits and n_samples is not None):
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    return rate, ch, bits, n_samples


#: Decoded-audio output schema (what decode_audio emits per media row).
AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)


def decode_audio(df: DataFrame, decoder=real_decode_audio) -> DataFrame:
    """mapInPandas audio-metadata decode over the same size-bucketed
    partitioning as decode_media; null payloads yield null features."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rate, ch, bits, ns = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    rate.append(None), ch.append(None)
                    bits.append(None), ns.append(None)
                    continue
                r, c, b, s = decoder(bytes(payload))
                rate.append(r), ch.append(c), bits.append(b), ns.append(s)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "sample_rate": pd.array(rate, dtype="Int32"),
                    "channels": pd.array(ch, dtype="Int32"),
                    "bits": pd.array(bits, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                }
            )

    return df.repartitionByRange("n_bytes").mapInPandas(batches, AUDIO_SCHEMA)


def real_decode_video(payload: bytes) -> tuple[int, int, int]:
    """Header-only video metadata for MP4/ISO-BMFF: (timescale,
    duration_units, n_tracks) from the moov/mvhd box — pure byte
    arithmetic over the box stream ([size u32][type 4cc][payload];
    size 1 = 64-bit largesize).  mvhd v0 carries timescale/duration as
    u32 at payload offsets 12/16, v1 as u32/u64 at 20/24 (ISO 14496-12
    §8.2.2).  Non-BMFF containers (mkv/avi/webm) need a demuxer and
    raise NotImplementedError — same honest-stub contract as the image
    and audio paths."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError(
            "real_decode_video parses MP4/ISO-BMFF headers only; other "
            "containers need a demuxer unavailable in this environment"
        )

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(payload[i : i + 4], "big")
            box = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize follows the type
                size = int.from_bytes(payload[i + 8 : i + 16], "big")
                body = i + 16
            elif size == 0:  # box extends to end of enclosure
                size = hi - i
            if size < 8:
                break
            yield box, body, i + size
            i += size

    for box, body, end in walk(0, len(payload)):
        if box != b"moov":
            continue
        timescale = duration = None
        n_tracks = 0
        for inner, b, _ in walk(body, end):
            if inner == b"trak":
                n_tracks += 1
            elif inner == b"mvhd":
                version = payload[b]
                if version == 0:
                    timescale = int.from_bytes(payload[b + 12 : b + 16], "big")
                    duration = int.from_bytes(payload[b + 16 : b + 20], "big")
                else:
                    timescale = int.from_bytes(payload[b + 20 : b + 24], "big")
                    duration = int.from_bytes(payload[b + 24 : b + 32], "big")
        if timescale and duration is not None:
            return timescale, duration, n_tracks
        raise ValueError("corrupt MP4: moov without readable mvhd")
    raise ValueError("MP4 with no moov box in payload prefix")


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
                if payload is None:  # null media column → null features
                    w.append(None)
                    h.append(None)
                    ck.append(None)
                    continue
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
                    # nullable Int32 (capital I): plain int32 cannot carry
                    # the null features of a null media payload
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "checksum": ck,
                }
            )

    return df.repartitionByRange("n_bytes").mapInPandas(batches, DECODED_SCHEMA)


#: Output schema of resize_media: payload replaced by the (stub-)resized
#: bytes plus the target geometry.
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler (Pillow absent): the
    'resized' payload is a content-derived truncation/pad to w*h bytes —
    stable across runs so tests can assert on digests."""
    target = max(1, (width * height) // 64)
    return (payload * ((target // max(1, len(payload))) + 1))[:target]


def resize_media(
    df: DataFrame, width: int, height: int, resizer=fake_resize
) -> DataFrame:
    """mapInPandas resize: Arrow batches in, resized payloads out.

    Same size-bucketed partitioning as decode_media; a real deployment
    swaps ``resizer`` for a Pillow/ffmpeg call with an identical
    signature — the Spark-side plumbing does not change.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = [resizer(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                }
            )

    return df.repartitionByRange("n_bytes").mapInPandas(batches, RESIZED_SCHEMA)


#: Output schema of sample_frames: one row per sampled frame.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def fake_frame_extract(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for a video demuxer: slices the payload into
    n_frames contiguous chunks (empty payload → no frames)."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)][:n_frames]


def sample_frames(
    df: DataFrame, n_frames: int = 4, extractor=fake_frame_extract
) -> DataFrame:
    """mapInPandas frame sampling: each media row fans out to ≤ n_frames
    frame rows — the row-multiplying multimodal shape (video → frames).

    The fan-out happens inside the Arrow batch loop (no Python-side
    explode of a collected list column), so peak memory is one batch of
    frames, and downstream per-frame operators see an ordinary
    (media_id, frame_index, frame) table partitionable by media_id.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # null media column → no frames
                    continue
                for i, fr in enumerate(extractor(bytes(payload), n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.repartitionByRange("n_bytes").mapInPandas(batches, FRAME_SCHEMA)
