"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns next to a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so payload bytes never round-trip
through Python row objects one at a time.

The image path is REAL for PNG: ``png_decode``/``png_encode`` implement
the public PNG specification (ISO/IEC 15948 / RFC 2083 — signature,
IHDR/IDAT/IEND chunks, zlib-inflated scanlines, filter types 0-4
including the Paeth predictor) with only stdlib ``zlib``/``struct`` +
numpy, and ``decode_image`` runs it Arrow-batched over a blob column.
Other containers (JPEG/libav) would need codec libraries this
environment doesn't ship; at deployment they'd slot into the same
``mapInPandas`` stage (same schema, same batch shape) via PIL/opencv.
``decode_features`` remains the codec-free byte-statistics path.

At 100 TB: payloads dominate row size, so stages select the narrowest
columns (never carry the blob past the stage that needs it), and
``spark.sql.files.maxPartitionBytes`` keeps Arrow batches bounded.
"""

from __future__ import annotations

import binascii
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_TYPE = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_blob(df: DataFrame, source_col: str, mime: str = "text/plain",
                blob_col: str = "blob", meta_col: str = "meta") -> DataFrame:
    """Wrap a column's UTF-8 bytes as an opaque payload + metadata struct
    — the fixture-side stand-in for reading real media files
    (spark.read.format('binaryFile') at scale)."""
    blob = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn(blob_col, blob).withColumn(
        meta_col, F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(blob).cast("long").alias("n_bytes")))


FEATURE_DIM = 8


def decode_features(df: DataFrame, id_col: str, blob_col: str = "blob",
                    ) -> DataFrame:
    """Arrow-batched feature extraction: (id, features array<double>).

    With a real codec this would decode and embed; here the
    deterministic fake is, per payload: [len, byte[0], byte[len//2],
    byte[-1], sum(bytes) % 997, min, max, distinct-byte-count] — enough
    structure to test partitioning, batch shape, and determinism.
    """
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("features",
                      T.ArrayType(T.DoubleType()), False),
    ])

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = []
            for blob in pdf["_blob"]:
                b = bytes(blob)
                if not b:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                feats.append([
                    float(len(b)), float(b[0]), float(b[len(b) // 2]),
                    float(b[-1]), float(sum(b) % 997),
                    float(min(b)), float(max(b)), float(len(set(b)))])
            yield pd.DataFrame({"id": pdf["_id"], "features": feats})

    narrow = df.select(F.col(id_col).cast("long").alias("_id"),
                       F.col(blob_col).alias("_blob"))
    return narrow.mapInPandas(extract, out_schema)


# --- PNG codec (public spec: ISO/IEC 15948 / RFC 2083) ----------------------
# 8-bit depth, non-interlaced, color types 0 (gray) / 2 (RGB) /
# 4 (gray+alpha) / 6 (RGBA). Palette (3), 16-bit, and Adam7 interlace
# raise ValueError — the deployment path for those is a native codec in
# the same mapInPandas stage.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS_OF_CTYPE = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec §9.4: predictor = nearest of left/up/upper-left to a+b-c
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(pixels: bytes, width: int, height: int,
               channels: int, filter_cycle: bool = True) -> bytes:
    """Minimal spec-conformant PNG writer: 8-bit, non-interlaced,
    channel-interleaved ``pixels`` of length width*height*channels.

    ``filter_cycle`` applies filter type ``y % 5`` to scanline ``y`` so
    that round-tripping through ``png_decode`` exercises every unfilter
    path (None/Sub/Up/Average/Paeth) — the property the llm14 oracle
    pins end to end."""
    if channels not in _CTYPE_OF_CHANNELS:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        ft = y % 5 if filter_cycle else 0
        raw.append(ft)
        if ft == 0:                                     # None
            raw.extend(line)
        elif ft == 1:                                   # Sub
            raw.extend((line[x] - (line[x - channels] if x >= channels
                                   else 0)) & 0xFF for x in range(stride))
        elif ft == 2:                                   # Up
            raw.extend((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif ft == 3:                                   # Average
            raw.extend((line[x] - ((line[x - channels] if x >= channels
                                    else 0) + prev[x]) // 2) & 0xFF
                       for x in range(stride))
        else:                                           # Paeth
            raw.extend((line[x] - _paeth(
                line[x - channels] if x >= channels else 0, prev[x],
                prev[x - channels] if x >= channels else 0)) & 0xFF
                for x in range(stride))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _CTYPE_OF_CHANNELS[channels], 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string → (width, height, channels, pixels).

    Walks the chunk stream (CRC-verified), inflates the concatenated
    IDAT payload, and reverses per-scanline filtering (types 0-4).
    ``pixels`` is the channel-interleaved 8-bit sample buffer."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, channels = 8, None, None, None
    idat = bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if binascii.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS_OF_CTYPE:
                raise ValueError(f"unsupported color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            channels = _CHANNELS_OF_CTYPE[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline buffer size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        rec = bytearray(stride)
        if ft == 0:                                     # None
            rec[:] = line
        elif ft == 1:                                   # Sub
            for x in range(stride):
                rec[x] = (line[x] + (rec[x - channels] if x >= channels
                                     else 0)) & 0xFF
        elif ft == 2:                                   # Up
            for x in range(stride):
                rec[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:                                   # Average
            for x in range(stride):
                rec[x] = (line[x] + ((rec[x - channels] if x >= channels
                                      else 0) + prev[x]) // 2) & 0xFF
        elif ft == 4:                                   # Paeth
            for x in range(stride):
                rec[x] = (line[x] + _paeth(
                    rec[x - channels] if x >= channels else 0, prev[x],
                    prev[x - channels] if x >= channels else 0)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y * stride:(y + 1) * stride] = rec
        prev = bytes(rec)
    return width, height, channels, bytes(out)


IMAGE_STATS_TYPE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_wsum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
])


def decode_image(df: DataFrame, id_col: str,
                 blob_col: str = "blob") -> DataFrame:
    """Arrow-batched PNG decode → per-image pixel statistics.

    One ``mapInPandas`` pass; per image: dimensions, channel count, and
    exact integer stats over the decoded sample stream (sum,
    position-weighted sum — which pins scanline order and unfiltering,
    not just the value multiset — min, max). Blob bytes never leave the
    stage; the output is a narrow 9-column frame.

    At 100 TB this is the canonical decode shape: the blob column is
    selected only here, partitions stay bounded by
    ``spark.sql.files.maxPartitionBytes``, and a native codec (PIL,
    libav) would replace ``png_decode`` without touching the plan."""

    def stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["_id"], pdf["_blob"]):
                w, h, c, px = png_decode(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                rows.append((
                    int(i), w, h, c, int(arr.size), int(arr.sum()),
                    int((np.arange(arr.size) * arr).sum()),
                    int(arr.min()), int(arr.max())))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_STATS_TYPE.fields])

    narrow = df.select(F.col(id_col).cast("long").alias("_id"),
                       F.col(blob_col).alias("_blob"))
    return narrow.mapInPandas(stats, IMAGE_STATS_TYPE)


def synthesize_png(df: DataFrame, id_col: str, w_col: str, h_col: str,
                   c_col: str, blob_col: str = "blob") -> DataFrame:
    """Deterministic PNG fixture generator (Arrow-batched): for each row
    the sample stream is ``px[i] = (id*31 + i*7) % 256`` over
    ``w*h*c`` samples, encoded with the filter-cycling writer. The
    closed-form pixel rule is what lets a SQL oracle recompute the
    decoded statistics without a PNG decoder of its own — any
    encode/decode defect breaks the match."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField(blob_col, T.BinaryType()),
    ])

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, w, h, c in zip(pdf["_id"], pdf["_w"], pdf["_h"],
                                  pdf["_c"]):
                i, w, h, c = int(i), int(w), int(h), int(c)
                n = w * h * c
                px = ((i * 31 + np.arange(n) * 7) % 256).astype(
                    np.uint8).tobytes()
                rows.append((i, w, h, c, png_encode(px, w, h, c)))
            yield pd.DataFrame(rows, columns=["id", "width", "height",
                                              "channels", blob_col])

    narrow = df.select(F.col(id_col).cast("long").alias("_id"),
                       F.col(w_col).cast("int").alias("_w"),
                       F.col(h_col).cast("int").alias("_h"),
                       F.col(c_col).cast("int").alias("_c"))
    return narrow.mapInPandas(build, out_schema)


def frame_sample_plan(n_frames: Column, every: int = 30) -> Column:
    """Frame indexes a video sampler would extract (plumbing only):
    sequence(0, n_frames-1, every) — the real decoder consumes this."""
    return F.sequence(F.lit(0), n_frames - 1, F.lit(every))
