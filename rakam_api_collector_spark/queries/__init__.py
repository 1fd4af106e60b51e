"""Query registry: every operator claimed in SURVEY.md §2 has an entry.

``QUERIES[name](spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``ORACLE[name]`` is the equivalent ANSI/DuckDB SQL the
driver runs side-by-side for the hash-match correctness gate. Names and
column aliases are identical on both sides by construction.

Ordering matters: the driver's correctness gate checks the FIRST 50
registry entries per round. The registry therefore leads with the
queries that most need fresh driver evidence this round and rotates the
rest behind them; every query keeps its entry (bench + pytest run all
83) — only the position changes round to round.

Rotation invariant: **every query's driver evidence is at most one
round old.** With 83 queries and a 50-slot window the cadence is two
rounds; each round's window = (all queries without a green row from
the previous round) + (everything modified this round) + fill.

Window history:
- r4: dq01-dq43 relational family (llm05-17/19/21-28 never yet run).
- r5: the 22 never-driver-verified llm queries (llm05-17, llm19,
  llm21-28), freshly fixed dq26/dq35, four new queries (llm29-32),
  plus a rotation of r3/r4-green queries. All 50 green.
- r6 (current): the 26 queries with no r5 row (dq01/02/04/06/07,
  dq09-11, dq18-25, dq27/28, dq33, dq37-43), the queries modified in
  r6 (llm12 multi-probe LSH, llm14 real PNG decode, llm32 singleton
  fast path), the NEW queries (llm33-36 real audio/video/resize/resample,
  dq44 grouping sets, dq45 range frame, dq46 stats agg), llm29-31 (one round of evidence),
  regression-prone families (llm09/16/17, dq26/35, llm10), and
  dedup/similarity fill. Out-of-window (33 queries, all r5-green,
  due back in r7): llm01-06, llm11, llm18-28, dq05/08, dq12-17
  (semi+anti), dq29-32, dq34/36. (The bench-regression watch for
  llm01/02/26/27 moved to bench.py's >1.2x min-of-2 rule to free
  slots for the new queries.)
"""

from __future__ import annotations

from rakam_api_collector_spark.queries import llm_ops, relational

_ALL_QUERIES = {**relational.QUERIES, **llm_ops.QUERIES}
_ALL_ORACLE = {**relational.ORACLE, **llm_ops.ORACLE}

# First 50 = this round's driver-checked window (see docstring history).
_WINDOW = [
    # 26 queries with no round-5 driver row — rotate back first
    "dq01_projection", "dq02_whitelist", "dq04_sink_envelope",
    "dq06_max_offset", "dq07_zone_map", "dq09_distinct_agg",
    "dq10_rollup", "dq11_sum_cents", "dq18_topk", "dq19_truncate",
    "dq20_safe_cast", "dq21_set_ops", "dq22_array_funcs", "dq23_hash",
    "dq24_scalars", "dq25_udf_shape", "dq27_json_encode",
    "dq28_date_format", "dq33_percentile", "dq37_hash_split",
    "dq38_cube", "dq39_pivot", "dq40_window_analytics",
    "dq41_approx_quantile", "dq42_funnel", "dq43_retention",
    # modified in round 6 — must carry fresh evidence
    "llm12_ann_lsh", "llm14_decode_features", "llm32_dedup_keep_best",
    "llm13_multimodal_meta", "dq03_late_split",
    # one round of evidence only (new in r5)
    "llm29_pack_sequences", "llm30_mixture_sample", "llm31_vocab_coverage",
    # regression-prone families: heavy dedup/ANN + previously broken ts
    "llm09_minhash_lsh", "llm16_dedup_clusters", "llm17_incremental_dedup",
    "dq26_epoch_conversions", "dq35_sessionize", "llm10_simhash",
    "llm07_exact_dedup", "llm08_jaccard_pairs", "llm15_embed_dedup",
    # new in r6 — no prior evidence (r5 bench-regression watch for
    # llm26/27/01/02 moved to bench.py's >1.2x min-of-2 rule)
    "llm33_audio_features", "llm34_video_sample", "llm35_resize_image",
    "dq44_grouping_sets", "dq45_range_frame", "dq46_stats_agg",
    "llm36_audio_resample",
]

assert len(_WINDOW) == 50 and len(set(_WINDOW)) == 50, len(_WINDOW)
assert not set(_WINDOW) - set(_ALL_QUERIES), set(_WINDOW) - set(_ALL_QUERIES)

_ORDER = _WINDOW + [k for k in _ALL_QUERIES if k not in set(_WINDOW)]

QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLE = {k: _ALL_ORACLE[k] for k in _ORDER if k in _ALL_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
