"""BPE tokenizer INDUCTION from a corpus (Sennrich et al., ACL 2016).

`operators/text.py:bpe_ish_tokens` applies a fixed segmentation; this
module learns the merge table itself — the other half of a training-
data pipeline, where the tokenizer is a model artifact trained on the
same corpus it will encode.

The scale property that makes this Spark-friendly: classical BPE
trains on the WORD-FREQUENCY TABLE, not the corpus. ONE corpus pass
aggregates (word, count) — for 100 TB of text that table is millions
of rows, not trillions — and the merge loop runs driver-side over
that bounded, collected state (top ``max_words`` rows; the k-means
bounded-collect rule), with a deterministic count-then-lexical
tie-break so the learned table is byte-for-byte reproducible. The
corpus is touched exactly once.

``learn_bpe`` returns the ordered merge list (the model);
``bpe_segment`` applies it to text as a deterministic encoder —
greedy lowest-rank-merge-first, the standard decode-time algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.text import tokens

_EOW = "</w>"       # end-of-word sentinel (Sennrich's formulation)


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) — the ONE corpus pass."""
    return (docs.select(F.explode(tokens(F.col(text_col)))
                        .alias("_w"))
            .groupBy("_w").agg(F.count("*").alias("_n")))


def learn_bpe(docs: DataFrame, text_col: str,
              n_merges: int = 50,
              min_pair_count: int = 2,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """The ordered merge table. ONE Spark pass aggregates the word-
    frequency table; the merge loop then runs driver-side over that
    bounded state (top ``max_words`` words by count — the same
    bounded-collect rule as k-means centroids, and how production BPE
    trainers work: the corpus is petabytes, the frequency table is
    megabytes). A distributed per-iteration rewrite was measured and
    rejected: 50 chained cached frames of pandas-udf lineage blow the
    driver heap, while the driver loop is exact and instant at any
    corpus scale because its input never exceeds max_words rows.

    Each iteration merges the single best weighted adjacent pair;
    training stops early when no pair reaches ``min_pair_count``
    (merging hapax pairs memorizes the corpus). Ties break by count
    desc, then pair lexically — byte-for-byte reproducible."""
    rows = (_word_table(docs, text_col)
            .orderBy(F.desc("_n"), F.asc("_w"))
            .limit(max_words).collect())       # bounded driver state
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["_w"]) + (_EOW,): r["_n"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a \
                        and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            nxt[key] = nxt.get(key, 0) + n
        vocab = nxt
    return merges


def bpe_segment(text: Column,
                merges: list[tuple[str, str]]) -> Column:
    """Deterministic encoder for a learned merge table: per word,
    greedily apply the LOWEST-RANK applicable merge until none apply
    (the standard BPE encode), emitting subword units with the
    end-of-word sentinel stripped from final units. Arrow-batched —
    the merge table rides the closure like a broadcast model."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rank = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            _, i = best
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        if syms[-1] == _EOW:
            syms = syms[:-1]
        elif syms[-1].endswith(_EOW):
            syms = syms[:-1] + [syms[-1][:-len(_EOW)]]
        return syms

    def seg(texts):
        import re

        from rakam_api_collector_spark.operators.text import \
            TOKEN_SPLIT_RE

        splitter = re.compile(TOKEN_SPLIT_RE)
        out = []
        cache: dict[str, list[str]] = {}
        for t in texts:
            units: list[str] = []
            # the EXACT word rule text.py:tokens applies (same regex),
            # so joined segments reconstruct the token stream
            for w in splitter.split((t or "").lower()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w)
                units.extend(got)
            out.append(units)
        return pd.Series(out)

    seg.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(seg, "array<string>")(text)
