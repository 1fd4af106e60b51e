"""Unigram-LM tokenizer INDUCTION from a corpus (Kudo, ACL 2018,
arXiv:1804.10959 — the SentencePiece unigram model).

`operators/bpe.py` learns a merge table bottom-up; this module learns
the OTHER standard subword model top-down: start from a large seed
vocabulary of candidate pieces, fit piece probabilities with EM over
the corpus segmentations, and prune the least-useful pieces until the
target vocabulary size remains. Production trainers (SentencePiece)
run exactly this loop on a word-frequency table — and that table is
the ONE thing the corpus pass must produce (for 100 TB of text it is
millions of rows, not trillions), so training is Spark-cheap by the
same argument as bpe.py: one corpus aggregate, then a bounded
driver-side model fit.

Determinism contract (the same bar as bpe.py / clustering.py): hard-EM
(Viterbi E-step) instead of forward-backward — the classic "Viterbi
training" variant — with total-order tie-breaks (higher count, then
shorter piece, then lexicographic) so the learned vocabulary is
byte-for-byte reproducible across runs and partitionings. Counts are
exact integers (weighted by word frequency); probabilities are formed
once per M-step from integer ratios.

``learn_unigram`` returns the model as ``[(piece, logp)]``;
``unigram_segment`` applies it as an Arrow-batched Viterbi encoder
(single-char fallback keeps coverage total, as SentencePiece's
character coverage does).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame

from rakam_api_collector_spark.operators.bpe import _word_table


def _viterbi(word: str, logp: dict[str, float],
             max_len: int, floor: float) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: standard
    Viterbi over cut positions. Unknown single chars cost ``floor``
    (coverage is total). Ties break toward the LONGER last piece,
    then lexicographically — a total order, so segmentation is
    deterministic for equal-probability pieces."""
    n = len(word)
    best: list[tuple[float, int]] = [(0.0, -1)] + [(-math.inf, -1)] * n
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = floor                     # single-char fallback
            score = best[i][0] + lp
            # strict >: i ascends, so on ties the SMALLEST i (longest
            # last piece) is kept — a total, deterministic order
            if score > best[j][0]:
                best[j] = (score, i)
    out: list[str] = []
    j = n
    while j > 0:
        i = best[j][1]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def learn_unigram(docs: DataFrame, text_col: str,
                  vocab_size: int = 200,
                  max_piece_len: int = 6,
                  seed_size: int = 2000,
                  em_iters: int = 2,
                  prune_rounds: int = 3,
                  max_words: int = 100_000) -> list[tuple[str, float]]:
    """The trained unigram model: ``[(piece, logp)]`` sorted by piece.

    ONE Spark pass aggregates the word-frequency table (top
    ``max_words`` by count — the bounded-collect rule bpe.py and
    k-means follow); the fit runs driver-side:

    1. SEED: every substring of every word up to ``max_piece_len``,
       weighted by word count; keep the ``seed_size`` heaviest plus
       ALL single characters (coverage must stay total).
    2. EM (``em_iters`` Viterbi-E / exact-count-M rounds): segment
       each word under current probs, re-estimate probs from the
       weighted piece counts.
    3. PRUNE over ``prune_rounds``: drop the lightest multi-char
       pieces (never single chars) in equal shares until
       ``vocab_size`` remain, re-running one EM round after each cut
       so survivors absorb the pruned pieces' mass — the shape of
       SentencePiece's EM-prune loop.

    Ties break (count desc, len asc, piece asc) — reproducible."""
    from pyspark.sql import functions as F
    rows = (_word_table(docs, text_col)
            .orderBy(F.desc("_n"), F.asc("_w"))
            .limit(max_words).collect())
    words: dict[str, int] = {r["_w"]: r["_n"] for r in rows}
    if not words:
        return []

    # 1. seed candidates
    sub_counts: dict[str, int] = {}
    for w, n in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                p = w[i:j]
                sub_counts[p] = sub_counts.get(p, 0) + n
    chars = {p for p in sub_counts if len(p) == 1}
    multi = sorted((p for p in sub_counts if len(p) > 1),
                   key=lambda p: (-sub_counts[p], len(p), p))
    vocab = chars | set(multi[:max(0, seed_size - len(chars))])

    floor_const = -20.0          # unknown-char cost, fixed & documented

    def em(pieces: set[str], iters: int) -> dict[str, int]:
        counts: dict[str, int] = {}
        for _ in range(iters):
            # floor-1 smoothing: a piece the previous E-step never used
            # keeps probability mass log(1/total) instead of log(0) —
            # it stays segmentable and gets pruned by count ordering
            total = sum(max(1, sub_counts.get(p, 1)) for p in pieces)
            lp = {p: math.log(max(1, sub_counts.get(p, 1)) / total)
                  for p in pieces}
            counts = {}
            for w, n in words.items():
                for p in _viterbi(w, lp, max_piece_len, floor_const):
                    counts[p] = counts.get(p, 0) + n
            # M-step feeds the next E-step through sub_counts proxy:
            # replace candidate weights with the realized usage so the
            # next segmentation sees fitted probabilities
            for p in pieces:
                sub_counts[p] = counts.get(p, 0)
        return counts

    counts = em(vocab, em_iters)
    # 3. prune to target size: each round cuts its share of the excess
    # lightest multi-char pieces (never single chars), then one EM
    # refit so survivors absorb the pruned pieces' mass
    n_multi_target = max(0, vocab_size - len(chars))
    for r in range(prune_rounds):
        cur_multi = sorted((p for p in vocab if len(p) > 1),
                           key=lambda p: (-counts.get(p, 0), len(p), p))
        excess = len(cur_multi) - n_multi_target
        if excess <= 0:
            break
        cut = max(1, excess // (prune_rounds - r))
        vocab = chars | set(cur_multi[:len(cur_multi) - cut])
        counts = em(vocab, 1)

    total = sum(counts.get(p, 0) for p in vocab) or 1
    model = []
    for p in sorted(vocab):
        c = counts.get(p, 0)
        lp = math.log(c / total) if c else floor_const
        model.append((p, round(lp, 6)))
    return model


def unigram_segment(text: Column,
                    model: list[tuple[str, float]]) -> Column:
    """Viterbi encoder for a learned unigram model — Arrow-batched,
    per-word cache, single-char fallback for full coverage. Joined
    segments reconstruct the token stream exactly (the same word rule
    as text.py:tokens)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)

    def seg(texts):
        import re

        from rakam_api_collector_spark.operators.text import \
            TOKEN_SPLIT_RE

        splitter = re.compile(TOKEN_SPLIT_RE)
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            units: list[str] = []
            for w in splitter.split((t or "").lower()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _viterbi(w, logp, max_len, -20.0)
                units.extend(got)
            out.append(units)
        return pd.Series(out)

    seg.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(seg, "array<string>")(text)
