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
- r9 (current): the 43 queries with no r8 row (the full r8 out-list
  above, due back per the invariant), the SIX new queries — four
  promoting the round-8 operator families to driver-oracle evidence
  (llm46 SemDeDup semantic dedup, llm47 boilerplate line removal,
  llm48 BPE merge-table induction, llm49 IVF-PQ recall gate) plus
  llm50 exact duplicate-substring removal (Lee'22) and llm51
  unigram-LM tokenizer induction (Kudo'18, in-band gates) — the
  registry grows 93 → 99, the LAST growth under the ≤100
  two-round-cadence capacity (STOP-GROWTH from r10) — and llm45,
  modified in r9 (registered input promoted from the VID1 fixture
  to a real MP4 container). llm17's r9 change is docstring-only
  (the perf-target closeout), so it yields its slot to llm51 and
  rotates back in r10.
  Out-of-window (49 queries, all r8-green, due back in r10 — which
  leaves exactly 1 slot for r10 modifications):
  dq01-04, dq06/07, dq09-11, dq18-28, dq33, dq35, dq37-46,
  llm07-10, llm12-15, llm17, llm29-36.

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

Round 9 spent the last headroom deliberately (93 → 99: the four
round-8 families promoted to oracle rows plus llm50/llm51) — so
ROUND 10 RULE: the registry is FROZEN at 99. The r10 window is the
49 r9-out queries + exactly ONE slot. If r10 modifies more than one
registered query's behavior, either (a) consolidate two
near-duplicate queries in the same commit to free a slot (candidates:
llm33/llm36 share the WAV decode path; dq14 has two rows), or
(b) declare an explicit one-round split of the check in this
docstring AND the README cadence table — never silently let a
modified query ride on stale evidence. Docstring-only edits don't
take a slot (the llm17 precedent, r9).
"""

from __future__ import annotations

from rakam_api_collector_spark.queries import llm_ops, relational

_ALL_QUERIES = {**relational.QUERIES, **llm_ops.QUERIES}
_ALL_ORACLE = {**relational.ORACLE, **llm_ops.ORACLE}

# First 50 = this round's driver-checked window (see docstring history).
_WINDOW = [
    # 43 queries with no round-8 driver row — rotate back first
    "dq05_route_fanout", "dq08_hash_agg",
    "dq12_join_dim", "dq13_multi_join", "dq14_anti_join",
    "dq14_semi_join", "dq15_outer_join", "dq16_window",
    "dq17_dedup_first", "dq29_envelope_parse",
    "dq30_tumbling_window", "dq31_asof_join", "dq32_salted_agg",
    "dq34_range_join", "dq36_approx_distinct", "dq47_sliding_window",
    "llm01_token_count", "llm02_ttr", "llm03_avg_token_len",
    "llm04_lang_id", "llm05_fingerprint", "llm06_quality",
    "llm11_knn_cosine", "llm16_dedup_clusters", "llm18_bpe_tokens",
    "llm19_ivf_ann", "llm20_tfidf", "llm21_pii_redact",
    "llm22_chunk_dedup", "llm23_contamination",
    "llm24_stratified_split", "llm25_repetition", "llm26_kmeans",
    "llm27_surprisal", "llm28_quantize", "llm37_bigram_lm",
    "llm38_training_order", "llm39_curriculum_bins",
    "llm40_quality_rules", "llm41_head_truncate",
    "llm42_curation_e2e", "llm43_compression_ratio",
    "llm44_jpeg_decode",
    # NEW in round 9: the round-8 operator families promoted to
    # driver-oracle evidence (VERDICT r8 ask #2), plus exact
    # duplicate-substring removal (Lee'22 — the last classic dedup
    # family the corpus toolkit lacked)
    "llm46_semantic_dedup", "llm47_boilerplate_removal",
    "llm48_bpe_merges", "llm49_ivf_pq_recall",
    "llm50_dup_span_removal", "llm51_unigram_tokenizer",
    # modified in round 9 — must carry fresh evidence (llm45's
    # registered input promoted to a real MP4 container; llm17's
    # r9 change is docstring-only — the perf-target closeout — so it
    # yields its slot to llm51 and rotates back in r10)
    "llm45_video_time_sample",
]

assert len(_WINDOW) == 50 and len(set(_WINDOW)) == 50, len(_WINDOW)
assert not set(_WINDOW) - set(_ALL_QUERIES), set(_WINDOW) - set(_ALL_QUERIES)

_ORDER = _WINDOW + [k for k in _ALL_QUERIES if k not in set(_WINDOW)]

QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLE = {k: _ALL_ORACLE[k] for k in _ORDER if k in _ALL_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
