"""Sequence packing for training pipelines: concat-and-chunk token
budgeting.

The standard LLM pre-training pack: documents concatenate in key order,
the token stream is cut every ``budget`` tokens, and a document belongs
to the sequence its FIRST token lands in (boundary-spanning text is
handled downstream by cross-document attention masks, so the assignment
itself is a pure prefix-sum — no stateful bin logic). Deterministic and
engine-independent: the same corpus always packs identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.text import token_count


def pack_sequences(docs: DataFrame, id_col: str, text_col: str,
                   budget: int, part_col: str | None = None) -> DataFrame:
    """(id, [part], n_tok, seq_id, seq_off) per document:
    ``seq_id = floor(tokens_before / budget)`` and
    ``seq_off = tokens_before % budget`` where ``tokens_before`` is the
    running token count over ``id_col`` order within ``part_col``.

    Scale: ONE shuffle (the window partition). Always pass ``part_col``
    (domain / language / shard) at scale — packing within shards is
    what real pipelines do anyway (global mixing happens upstream), and
    it keeps every window partition bounded; ``part_col=None`` packs
    through a single-partition window and is only for small corpora.
    """
    part_cols = [part_col] if part_col else []
    w = (Window.partitionBy(*(part_cols or [F.lit(0)]))
         .orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs.select(id_col, *part_cols,
                        token_count(F.col(text_col)).alias("n_tok"))
            .withColumn("_before",
                        F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
            .withColumn("seq_id",
                        F.floor(F.col("_before") / budget))
            .withColumn("seq_off", F.col("_before") % budget)
            .drop("_before"))
