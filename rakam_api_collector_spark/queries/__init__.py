"""Query registry: every operator claimed in SURVEY.md §2 has an entry.

``QUERIES[name](spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``ORACLE[name]`` is the equivalent ANSI/DuckDB SQL the
driver runs side-by-side for the hash-match correctness gate. Names and
column aliases are identical on both sides by construction.
"""

from __future__ import annotations

from rakam_api_collector_spark.queries import llm_ops, relational

QUERIES = {**relational.QUERIES, **llm_ops.QUERIES}
ORACLE = {**relational.ORACLE, **llm_ops.ORACLE}

__all__ = ["QUERIES", "ORACLE"]
