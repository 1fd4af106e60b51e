"""Query registry: every operator claimed in SURVEY.md §2 has an entry.

``QUERIES[name](spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``ORACLE[name]`` is the equivalent ANSI/DuckDB SQL the
driver runs side-by-side for the hash-match correctness gate. Names and
column aliases are identical on both sides by construction.

Ordering matters: the driver's correctness gate checks the FIRST 50
registry entries per round. The registry therefore leads with the
queries that most need fresh driver evidence this round and rotates the
rest behind them; every query keeps its entry (bench + pytest run all
93) — only the position changes round to round.

Rotation invariant: **every query's driver evidence is at most one
round old.** With 93 queries and a 50-slot window the cadence is two
rounds; each round's window = (all queries without a green row from
the previous round) + (everything modified this round) + fill.

Window history:
- r4: dq01-dq43 relational family (llm05-17/19/21-28 never yet run).
- r5: the 22 never-driver-verified llm queries (llm05-17, llm19,
  llm21-28), freshly fixed dq26/dq35, four new queries (llm29-32),
  plus a rotation of r3/r4-green queries. All 50 green.
- r6: the 26 queries with no r5 row, r6-modified (llm12/14/32, llm13,
  dq03), new llm33-36 + dq44-46, llm29-31, regression-prone fill.
  All 50 green.
- r7: the 33 queries with no r6 row (llm01-06, llm11,
  llm18-28, dq05/08, dq12-17 semi+anti, dq29-32, dq34/36 — all
  r5-green, due back per the invariant), the queries modified in r7
  (llm12 query-directed multi-probe + single-scan ANN; dq34 bucketed
  band_join — already in the stale set; llm33/llm36 whose WAV decode
  gained truncated-chunk rejection), the NEW queries (llm37 bigram
  LM, llm38 training order, llm39 curriculum bins, llm40 Gopher
  quality rules, llm41 head truncation, llm42 end-to-end curation
  funnel, dq47 sliding window, llm43 compression-ratio signal,
  llm44 real JPEG decode gate, llm45 timestamp-based video
  sampling), and heavy regression-prone fill (llm09/10/16/17).
  All 50 green.
- r8 (current): the 43 queries with no r7 row (dq01-04, dq06/07,
  dq09-11, dq18-28, dq33, dq35, dq37-46, llm07/08, llm13-15,
  llm29-32, llm34/35 — all r6-green, due back per the invariant),
  the queries modified in r8 (llm12, whose correctness gate reverts
  to the fold-form cosine for oracle determinism; llm17, whose
  ingest protocol folds the verdict/append actions; llm33/llm36,
  whose IMA-ADPCM decode gained truncated-final-block support;
  llm45, whose time sampler gained the real MP4/MKV container
  branch — the VID1 path is unchanged and pinned by three-way
  parity tests), and heavy regression-prone fill (llm09/10).
  Out-of-window (43 queries, all r7-green, due back in r9):
  dq05/08, dq12-17 (semi+anti), dq29-32, dq34, dq36, dq47,
  llm01-06, llm11, llm16, llm18-28, llm37-44.

CAPACITY NOTE for round 8+: with 93 queries and a 50-slot window, 43
must rotate back each round, leaving only 7 slots for new/modified/
fill. The invariant stays satisfiable while total queries ≤ 100
(two-round cadence); past that, either consolidate near-duplicate
queries or split the check across rounds explicitly (and say so in
the README table). Prefer deepening existing queries over adding new
ones from here. Round 8 chose STOP-GROWTH: zero new queries (new
capability — progressive JPEG, float WAV, manifest conflict
detection, maintenance scheduling, the format("manifest") DataSource
with streaming version-offsets, real ISO-BMFF/MP4 demux, Z-order
clustering, bin-packing compaction, per-file Bloom sidecars, and
IVF-PQ with exact rerank — landed as pytest-pinned deepening of
existing surfaces), keeping the registry at 93 and the two-round
cadence exactly satisfiable.
"""

from __future__ import annotations

from rakam_api_collector_spark.queries import llm_ops, relational

_ALL_QUERIES = {**relational.QUERIES, **llm_ops.QUERIES}
_ALL_ORACLE = {**relational.ORACLE, **llm_ops.ORACLE}

# First 50 = this round's driver-checked window (see docstring history).
_WINDOW = [
    # 43 queries with no round-7 driver row — rotate back first
    "dq01_projection", "dq02_whitelist", "dq03_late_split",
    "dq04_sink_envelope", "dq06_max_offset", "dq07_zone_map",
    "dq09_distinct_agg", "dq10_rollup", "dq11_sum_cents",
    "dq18_topk", "dq19_truncate", "dq20_safe_cast",
    "dq21_set_ops", "dq22_array_funcs", "dq23_hash",
    "dq24_scalars", "dq25_udf_shape", "dq26_epoch_conversions",
    "dq27_json_encode", "dq28_date_format", "dq33_percentile",
    "dq35_sessionize", "dq37_hash_split", "dq38_cube",
    "dq39_pivot", "dq40_window_analytics", "dq41_approx_quantile",
    "dq42_funnel", "dq43_retention", "dq44_grouping_sets",
    "dq45_range_frame", "dq46_stats_agg",
    "llm07_exact_dedup", "llm08_jaccard_pairs", "llm13_multimodal_meta",
    "llm14_decode_features", "llm15_embed_dedup",
    "llm29_pack_sequences", "llm30_mixture_sample",
    "llm31_vocab_coverage", "llm32_dedup_keep_best",
    "llm34_video_sample", "llm35_resize_image",
    # modified in round 8 — must carry fresh evidence (llm45's time
    # sampler gained the real-container MP4/MKV branch; the VID1
    # fixture path is unchanged and pinned, but the operator moved,
    # so it takes a fill slot)
    "llm12_ann_lsh", "llm17_incremental_dedup",
    "llm33_audio_features", "llm36_audio_resample",
    "llm45_video_time_sample",
    # regression-prone heavy fill (r7-green)
    "llm09_minhash_lsh", "llm10_simhash",
]

assert len(_WINDOW) == 50 and len(set(_WINDOW)) == 50, len(_WINDOW)
assert not set(_WINDOW) - set(_ALL_QUERIES), set(_WINDOW) - set(_ALL_QUERIES)

_ORDER = _WINDOW + [k for k in _ALL_QUERIES if k not in set(_WINDOW)]

QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLE = {k: _ALL_ORACLE[k] for k in _ORDER if k in _ALL_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
