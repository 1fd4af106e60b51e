"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns next to a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so payload bytes never round-trip
through Python row objects one at a time.

The actual codecs (PIL/libav/etc.) are NOT available in this
environment, so ``decode_features`` computes a deterministic fake
feature vector (documented below) when no codec import succeeds, and
``decode_image`` raises NotImplementedError — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested; only the
pixel math is stubbed.

At 100 TB: payloads dominate row size, so stages select the narrowest
columns (never carry the blob past the stage that needs it), and
``spark.sql.files.maxPartitionBytes`` keeps Arrow batches bounded.
"""

from __future__ import annotations

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


def decode_image(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Real image decode — requires a codec library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this "
        "environment; use decode_features for the plumbing-tested path")


def frame_sample_plan(n_frames: Column, every: int = 30) -> Column:
    """Frame indexes a video sampler would extract (plumbing only):
    sequence(0, n_frames-1, every) — the real decoder consumes this."""
    return F.sequence(F.lit(0), n_frames - 1, F.lit(every))
