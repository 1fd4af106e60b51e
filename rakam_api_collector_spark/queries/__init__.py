"""Query registry: every operator claimed in SURVEY.md §2 has an entry.

``QUERIES[name](spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``ORACLE[name]`` is the equivalent ANSI/DuckDB SQL the
driver runs side-by-side for the hash-match correctness gate. Names and
column aliases are identical on both sides by construction.

Ordering matters: the driver's correctness gate checks the FIRST 50
registry entries per round. The registry therefore leads with the
queries that most need fresh driver evidence this round and rotates the
rest behind them; every query keeps its entry (bench + pytest run all
72) — only the position changes round to round.

Round-5 window: the 22 llm dedup/similarity/curation queries that had
never produced a driver-oracle row (llm05-17, llm19, llm21-28), the
two freshly fixed TIMESTAMP_NTZ queries (dq26, dq35), the three new
packing/mixture/vocab queries (llm29-31), then a rotation of queries
green in r3/r4.
"""

from __future__ import annotations

from rakam_api_collector_spark.queries import llm_ops, relational

_ALL_QUERIES = {**relational.QUERIES, **llm_ops.QUERIES}
_ALL_ORACLE = {**relational.ORACLE, **llm_ops.ORACLE}

# First 50 = this round's driver-checked window.
_WINDOW = [
    # never-driver-verified llm family (22)
    "llm05_fingerprint", "llm06_quality", "llm07_exact_dedup",
    "llm08_jaccard_pairs", "llm09_minhash_lsh", "llm10_simhash",
    "llm11_knn_cosine", "llm12_ann_lsh", "llm13_multimodal_meta",
    "llm14_decode_features", "llm15_embed_dedup", "llm16_dedup_clusters",
    "llm17_incremental_dedup", "llm19_ivf_ann", "llm21_pii_redact",
    "llm22_chunk_dedup", "llm23_contamination", "llm24_stratified_split",
    "llm25_repetition", "llm26_kmeans", "llm27_surprisal",
    "llm28_quantize",
    # fixed this round — need green evidence again (2)
    "dq26_epoch_conversions", "dq35_sessionize",
    # new this round — no prior evidence (4)
    "llm29_pack_sequences", "llm30_mixture_sample",
    "llm31_vocab_coverage", "llm32_dedup_keep_best",
    # rotation of r3/r4-green queries (22)
    "llm01_token_count", "llm02_ttr", "llm03_avg_token_len",
    "llm04_lang_id", "llm18_bpe_tokens", "llm20_tfidf",
    "dq03_late_split", "dq05_route_fanout",
    "dq08_hash_agg", "dq12_join_dim", "dq13_multi_join",
    "dq14_semi_join", "dq14_anti_join", "dq15_outer_join",
    "dq16_window", "dq17_dedup_first",
    "dq29_envelope_parse", "dq30_tumbling_window", "dq31_asof_join",
    "dq32_salted_agg", "dq34_range_join", "dq36_approx_distinct",
]

assert len(_WINDOW) == 50 and len(set(_WINDOW)) == 50, len(_WINDOW)
assert not set(_WINDOW) - set(_ALL_QUERIES), set(_WINDOW) - set(_ALL_QUERIES)

_ORDER = _WINDOW + [k for k in _ALL_QUERIES if k not in set(_WINDOW)]

QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLE = {k: _ALL_ORACLE[k] for k in _ORDER if k in _ALL_ORACLE}

__all__ = ["QUERIES", "ORACLE"]
