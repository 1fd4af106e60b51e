"""Deterministic sampling / split operators for training-data pipelines.

``sample()``-style random sampling is seed-deterministic only for a
fixed partitioning — repartition the corpus and the sample changes. A
training pipeline needs splits that are a PURE FUNCTION OF THE ROW
(reproducible across runs, engines, partitionings, and as the corpus
grows: a document's split assignment never changes when other documents
are added). The standard construction: bucket a stable key's hash and
threshold the bucket.

md5 is the hash here — not for speed but because the split must be
REPRODUCIBLE OUTSIDE SPARK (the DuckDB oracle, a Python reader, a
different engine): every engine has md5; xxhash64 seeds differ across
implementations. For hot paths where cross-engine reproducibility is
not needed, pass ``hash_expr=F.xxhash64(...)``-style overrides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex digits of the
    key's string form, mod buckets. Pure function of the key value."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
            .cast("long") % buckets


def hash_split(df: DataFrame, key: str, frac_pct: int = 10,
               buckets: int = 100) -> tuple[DataFrame, DataFrame]:
    """(selected, rest): rows whose hash bucket < frac_pct — the
    train/test split primitive. Row-local predicate: no shuffle, pushes
    into the scan stage, and each row's assignment is permanent."""
    b = hash_bucket(F.col(key), buckets)
    return df.filter(b < frac_pct), df.filter(b >= frac_pct)
