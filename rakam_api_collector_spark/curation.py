"""Composable curation pipeline: the training-data stages as one API.

The operators under ``operators/`` are the primitives; this module is
the user-facing composition a pipeline team actually runs — the batch
analog of the reference's source→transform→sink chain
(StreamWorkerContext → TargetConnectorCommitter), re-aimed at corpus
curation:

    from rakam_api_collector_spark import curation as C
    pipe = C.CurationPipeline([
        C.gopher_filter(),
        C.exact_dedup(),
        C.minhash_dedup(threshold=0.8),
        C.head_truncate(2048),
        C.mixture({"web": 0.6, "code": 0.4}),
        C.training_order(n_shards=1024, seed=0),
    ])
    curated = pipe.run(docs)                  # one lazy DataFrame
    curated, funnel = pipe.run(docs, audit=True)

Every stage is a pure ``DataFrame -> DataFrame`` function over a frame
with at least (``doc_id``, ``text``); stages that add columns document
them. ``run`` folds the stages into ONE lazy plan — Catalyst sees the
whole pipeline, so filters combine, row-local stages fuse into the scan
stage, and nothing materializes until the caller writes. ``audit=True``
additionally counts rows after each stage (one action per stage — the
per-stage numbers a data-governance review wants; skip it in
production and read counts off the sink instead).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import text as T

Stage = Callable[[DataFrame], DataFrame]


def html_extract(id_col: str = "doc_id", html_col: str = "html",
                 max_link_density: float | None = 0.5) -> Stage:
    """Extraction FRONT stage (web corpora: run before everything —
    boilerplate/quality/dedup all assume extracted text): HTML →
    (``text``, ``title``, ``n_links``, ``link_density``) via
    ``operators.html.html_to_text``, then the classic link-density
    chrome filter (Kohlschütter'10; ``None`` disables). Other input
    columns besides ``id_col`` drop — text replaces markup as the
    document body."""
    from rakam_api_collector_spark.operators.html import html_to_text

    def stage(df: DataFrame) -> DataFrame:
        out = html_to_text(df, id_col, html_col)
        if max_link_density is not None:
            out = out.filter(F.col("link_density") <= max_link_density)
        return out
    return stage


def gopher_filter(text_col: str = "text", **thresholds) -> Stage:
    """Row-local hard quality rules (Rae et al. 2021) — the scan-speed
    pre-filter. LITERALLY the battery the llm40/llm42 oracle queries
    pin: signals and thresholds come from operators/text.py
    (gopher_signals / gopher_verdicts / GOPHER_THRESHOLDS), so the
    pipeline cannot drift from the oracle-verified behavior. Override
    individual thresholds by keyword (e.g. ``min_tokens=50``)."""
    def stage(df: DataFrame) -> DataFrame:
        verdicts = T.gopher_verdicts(
            T.gopher_signals(F.col(text_col)), **thresholds)
        keep = None
        for cond in verdicts.values():
            keep = cond if keep is None else (keep & cond)
        return df.filter(keep)
    return stage


def exact_dedup(id_col: str = "doc_id", text_col: str = "text") -> Stage:
    """Keep the min-id document per token-normalized text — one window
    shuffle on the normalized key, no self-join."""
    from rakam_api_collector_spark.operators import dedup as D

    def stage(df: DataFrame) -> DataFrame:
        norm = F.array_join(T.tokens(F.col(text_col)), " ")
        return (D.exact_dedup(df.withColumn("_cur_norm", norm),
                              ["_cur_norm"], [id_col])
                .drop("_cur_norm"))
    return stage


def minhash_dedup(threshold: float = 0.8, n: int = 3,
                  num_perm: int = 128, bands: int = 64,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> Stage:
    """Near-dup removal: banded MinHash-LSH candidate discovery, exact
    verify, transitive clusters, min-id survivor
    (operators/dedup.py end to end)."""
    from rakam_api_collector_spark.operators.dedup import (
        dedup_verdict, minhash_lsh_pairs)

    def stage(df: DataFrame) -> DataFrame:
        pairs = minhash_lsh_pairs(df, id_col, text_col, n=n,
                                  threshold=threshold,
                                  num_perm=num_perm, bands=bands)
        verdict = dedup_verdict(df, id_col, pairs)
        keep = verdict.filter("keep").select(id_col)
        return df.join(keep, id_col, "left_semi")
    return stage


def semantic_dedup(threshold: float = 0.92, k: int = 16,
                   id_col: str = "doc_id",
                   vec_col: str = "embedding",
                   centroids: list[list[float]] | None = None) -> Stage:
    """SemDeDup stage (Abbas et al. 2023): drop documents whose
    EMBEDDINGS are near-identical within a k-means cluster, keeping
    the min-id member of each semantic duplicate group — the
    meaning-level complement to minhash_dedup's surface-level n-gram
    match (a paraphrase dedups here, not there). Requires the frame to
    carry ``vec_col``; pass trained ``centroids`` to skip
    re-clustering per batch."""
    from rakam_api_collector_spark.operators.dedup import (
        dedup_verdict, semantic_dedup_pairs)

    def stage(df: DataFrame) -> DataFrame:
        if vec_col not in df.columns:
            raise ValueError(
                f"semantic_dedup needs an embedding column "
                f"{vec_col!r}; the frame has {df.columns}")
        pairs = semantic_dedup_pairs(df, id_col, vec_col,
                                     threshold=threshold, k=k,
                                     centroids=centroids)
        verdict = dedup_verdict(df, id_col, pairs)
        keep = verdict.filter("keep").select(id_col)
        return df.join(keep, id_col, "left_semi")
    return stage


def span_dedup(k: int = 50, id_col: str = "doc_id",
               text_col: str = "text") -> Stage:
    """Exact duplicate-substring removal stage (Lee et al. 2022): cut
    every non-canonical occurrence of any k-token window from the
    surviving documents' text — the SUB-document complement to the
    whole-document dedup stages (boilerplate paragraphs, quoted
    passages, licence blocks survive exact/minhash/semantic dedup
    because the documents differ; this removes the repeated span
    itself). Rewrites ``text`` and adds ``n_tokens_removed``."""
    from rakam_api_collector_spark.operators.dedup import \
        duplicate_span_removal

    def stage(df: DataFrame) -> DataFrame:
        cleaned = duplicate_span_removal(df, id_col, text_col, k=k) \
            .select(id_col, F.col(text_col).alias("_cur_clean"),
                    "n_tokens_removed")
        return (df.drop("n_tokens_removed").join(cleaned, id_col)
                .withColumn(text_col, F.col("_cur_clean"))
                .drop("_cur_clean"))
    return stage


def head_truncate(max_tokens: int, text_col: str = "text") -> Stage:
    """Token-budget cap: keep the first ``max_tokens`` tokens (row
    local). Rewrites ``text`` as the space-joined kept tokens and adds
    ``n_tokens``."""
    def stage(df: DataFrame) -> DataFrame:
        tk = T.tokens(F.col(text_col))
        kept = F.slice(tk, 1, max_tokens)
        return (df.withColumn("n_tokens",
                              F.least(F.size(tk), F.lit(max_tokens)))
                .withColumn(text_col, F.array_join(kept, " ")))
    return stage


def mixture(weights: dict[str, float], group_col: str = "source",
            key_col: str = "doc_id") -> Stage:
    """Deterministic domain-mixture downsampling
    (operators/sampling.py:mixture_sample) — broadcast rate table, row
    local keep, zero data shuffle."""
    from rakam_api_collector_spark.operators.sampling import (
        mixture_sample)

    def stage(df: DataFrame) -> DataFrame:
        return mixture_sample(df, key_col, group_col, weights)
    return stage


def token_budget(weights: dict[str, float], budget: int,
                 tokens_col: str = "n_tok",
                 group_col: str = "source",
                 key_col: str = "doc_id", seed: int = 0) -> Stage:
    """Exact token-budget mixture sampling
    (operators/sampling.py:sample_token_budget, r15) — the unit a
    training run budgets: per-group seeded-md5 prefix until
    w_g·budget tokens. ``tokens_col`` must already exist (compute it
    upstream with text.token_count — curation stages keep one lazy
    Catalyst plan, so the column folds into the same scan)."""
    from rakam_api_collector_spark.operators.sampling import (
        sample_token_budget)

    def stage(df: DataFrame) -> DataFrame:
        return sample_token_budget(df, key_col, group_col, tokens_col,
                                   weights, budget, seed=seed)
    return stage


def dsir_select(target: DataFrame, k: int, n: int = 2,
                buckets: int = 10_000, alpha: float = 1.0,
                seed: int = 0, temperature: float = 1.0,
                id_col: str = "doc_id", text_col: str = "text") -> Stage:
    """Target-distribution selection stage (operators/dsir.py, Xie'23
    importance resampling): keep the k documents sampled without
    replacement ∝ importance weight toward ``target``. Pipeline
    position per the paper: after dedup/quality (selection assumes a
    deduplicated pool — duplicated docs would each draw their own
    Gumbel and multiply their selection odds), before mixture /
    truncation / ordering.

    Scale shape: the selection itself is the operator's bounded-heap
    top-k; the stage then semi-joins the k selected ids back to the
    corpus so downstream stages see full document rows — Spark
    broadcasts the id frame when k is under the broadcast threshold,
    and falls back to a shuffle semi join for billion-row selections
    (AQE's call — forcing broadcast here would OOM exactly at the
    corpus sizes DSIR is for)."""
    from rakam_api_collector_spark.operators import dsir

    def stage(df: DataFrame) -> DataFrame:
        ids = dsir.dsir_select(
            df.sparkSession, df, target, id_col, text_col, k, n,
            buckets, alpha, seed, temperature).select(id_col)
        return df.join(ids, id_col, "left_semi")
    return stage


def training_order(n_shards: int, seed: int = 0,
                   key_col: str = "doc_id") -> Stage:
    """Deterministic global shuffle + sharding
    (operators/sampling.py:training_order): adds (shard, pos)."""
    from rakam_api_collector_spark.operators import sampling

    def stage(df: DataFrame) -> DataFrame:
        return sampling.training_order(df, key_col, n_shards, seed=seed)
    return stage


class CurationPipeline:
    """Fold a stage list into one lazy plan; optionally audit counts."""

    def __init__(self, stages: list[Stage]) -> None:
        self.stages = list(stages)

    def run(self, docs: DataFrame, audit: bool = False):
        """Without ``audit``: the composed lazy DataFrame. With it:
        ``(df, funnel)`` where funnel is ``[(stage_name, rows_after)]``
        prefixed by ``("input", rows_in)`` — each count is an action."""
        df = docs
        if not audit:
            for stage in self.stages:
                df = stage(df)
            return df
        funnel = [("input", docs.count())]
        for stage in self.stages:
            df = stage(df)
            name = getattr(stage, "__qualname__", repr(stage))
            funnel.append((name.split(".")[0], df.count()))
        return df, funnel
