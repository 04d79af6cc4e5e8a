"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads + typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side machinery (schema, batch iteration, partition-preserving
transform) is real and tested. Decode is REAL for formats whose specs
need only stdlib byte math — BMP dimensions, WAV duration — and a
clearly-marked deterministic fake for codec formats (JPEG/MP4/...)
whose libraries (PIL/ffmpeg/librosa) are not in this container.
At scale, the pattern is: keep payloads in parquet binary columns,
`repartition` so each Arrow batch fits executor memory, decode inside
mapInPandas (one Python worker per core, Arrow transfer amortized).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, duration_ms int"
)


def synthesize_media(df: DataFrame, id_col: str, payload_src: str, kind: str) -> DataFrame:
    """Build a media table from any string column (deterministic fake
    payloads for tests — real pipelines read binary parquet directly).
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(payload_src), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB: deterministic pseudo-features in lieu of a real decoder.

    A real deployment replaces this with PIL.Image.open /
    av.open(BytesIO(payload)) etc. — signature and batch shape stay
    identical, which is the part under test.
    """
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    duration_ms = int.from_bytes(h[2:4], "big")
    return width, height, duration_ms


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """Dispatch decode: REAL header parsing for formats whose specs
    need only stdlib byte math (BMP dimensions, WAV duration); the
    deterministic fake for everything else (JPEG/MP4/... would need
    the image/av libs this container lacks).

    BMP: 'BM' magic; width/height are little-endian int32 at offsets
    18/22 of the BITMAPINFOHEADER (height may be negative for
    top-down rows). WAV: RIFF/WAVE magic; byte rate is little-endian
    uint32 at offset 8 of the 'fmt ' CHUNK — located by the chunk
    scan, never assumed to sit first (editors emit JUNK/LIST chunks
    before it) — and duration = data-chunk bytes / byte rate.
    """
    import struct

    if payload[:2] == b"BM" and len(payload) >= 26:
        width, height = struct.unpack_from("<ii", payload, 18)
        return abs(width), abs(height), 0
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 44:
        byte_rate = None
        data_size = None
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            size = struct.unpack_from("<I", payload, off + 4)[0]
            if cid == b"fmt " and size >= 12 and off + 8 + 12 <= len(payload):
                byte_rate = struct.unpack_from("<I", payload, off + 8 + 8)[0]
            elif cid == b"data":
                data_size = size
            if byte_rate is not None and data_size is not None:
                if byte_rate:
                    return 0, 0, int(data_size * 1000 // byte_rate)
                break
            off += 8 + size + (size % 2)
    return _fake_decode(payload)


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: payload binary → typed features.

    Arrow-batched; no shuffle (narrow transform over the scan).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "duration_ms": [f[2] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each media row into frame
    timestamps (decode stubbed). Demonstrates the explode-side of the
    pipeline: rows stay co-partitioned with their media file.
    """
    decoded = decode_media(df)
    return decoded.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
