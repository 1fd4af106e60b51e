"""Perceptual image hashing (pHash) + banded near-dup candidates —
image-modality dedup, the SimHash-for-pixels the multimodal corpus
needs (exact byte dedup misses re-encoded / resized / brightness-
shifted copies; pHash is invariant to exactly those).

The classic DCT pHash (the imagehash/pHash.org construction, public
domain since Zauner 2010): luma (ITU-R BT.601) → floor-index resize
to 32×32 (the same exact-integer map as ``multimodal.nn_resize``) →
orthonormal 2-D DCT-II (two matmuls) → top-left 8×8 low-frequency
block → bit i = coeff_i > median(block). 64 bits; Hamming distance ≈
perceptual distance. Uniform brightness/contrast changes move the DC
coefficient and SCALE the rest, so median-relative bits barely move —
the invariance the test pins.

Spark shape: signatures are ONE mapInPandas pass over image bytes
(per-row map, no shuffle); candidate pairs reuse the chunk-pigeonhole
rule of ``dedup.simhash_candidates`` — equal 16-bit chunk ⇒ candidate
(complete for Hamming ≤ chunks−1) — as a bucket self-join that only
ever joins signatures, never pixels. 100 TB: decode cost is the scan,
the join is |bucket|-bounded like every banded dedup in this repo.
"""

from __future__ import annotations

from struct import error as struct_error
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_N, _LOW = 32, 8


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis: D @ x applies the transform."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix(_N)


def phash64(width: int, height: int, channels: int,
            pixels: bytes) -> int:
    """64-bit pHash of an 8-bit interleaved sample buffer (the
    ``multimodal.png_decode`` / ``jpeg_decode`` output shape).
    Signed int64 so the value lives in a Spark LongType column."""
    if width < 1 or height < 1:
        raise ValueError("empty image")
    a = np.frombuffer(pixels, dtype=np.uint8)
    if len(a) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(a)} != {width}x{height}x{channels}")
    a = a.reshape(height, width, channels).astype(np.float64)
    if channels >= 3:
        gray = (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                + 0.114 * a[:, :, 2])
    else:
        gray = a[:, :, 0]               # gray / gray+alpha: the luma
    ys = (np.arange(_N) * height) // _N  # exact floor-index resize —
    xs = (np.arange(_N) * width) // _N   # the nn_resize map
    small = gray[ys][:, xs]
    low = (_DCT @ small @ _DCT.T)[:_LOW, :_LOW].ravel()
    bits = low > np.median(low)
    return int(np.packbits(bits).view(">u8")[0].astype(np.int64,
                                                       casting="unsafe"))


def phash_of_image_bytes(buf: bytes) -> int:
    """pHash of encoded image bytes — PNG or JPEG sniffed (the
    ``decode_image_stats`` convention)."""
    from rakam_api_collector_spark.operators.jpeg import jpeg_decode
    from rakam_api_collector_spark.operators.multimodal import \
        png_decode

    if buf[:2] == b"\xff\xd8":
        w, h, c, px = jpeg_decode(buf)
    else:
        w, h, c, px = png_decode(buf)
    return phash64(w, h, c, px)


def phash_signatures(df: DataFrame, id_col: str, image_col: str,
                     skip_invalid: bool = True) -> DataFrame:
    """(_id, _ph) per image — ONE Arrow pass, PNG or JPEG bytes
    sniffed per row. Corrupt images follow the ST11 drop-vs-raise
    contract."""
    out = T.StructType([T.StructField("_id", T.LongType()),
                        T.StructField("_ph", T.LongType())])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["_id"], pdf["_img"]):
                try:
                    rows.append([int(rid),
                                 phash_of_image_bytes(bytes(raw))])
                except (ValueError, struct_error):
                    if not skip_invalid:
                        raise
            yield pd.DataFrame(rows, columns=["_id", "_ph"])

    return (df.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(image_col).alias("_img"))
            .mapInPandas(run, out))


def _capped_bucket_pairs(buckets: DataFrame, keys: list[str],
                         max_bucket: int | None,
                         with_hamming: bool = True) -> DataFrame:
    """Self-join equal-key buckets into candidate pairs, with the
    adversarial-bucket guard: a bucket holding > ``max_bucket``
    members (a mass-duplication flood — thousands of re-uploads of
    the same near-black thumbnail hash into ONE chunk value) would
    make the all-pairs self-join O(n²) in that bucket and eat the
    stage at scale. Such buckets degrade to a STAR join — every
    member pairs with the bucket's min-id representative, O(n) —
    which keeps each flood connected (downstream dedup clustering
    reaches every member through the representative) instead of
    dropping it. Recall caveat, stated plainly: inside a capped
    bucket, member↔member pairs whose Hamming would have passed a
    downstream threshold while both sit far from the representative
    are not emitted; below the cap behavior is exact. The measured
    degeneracy and the cap's effect are in STRESS.md (phash_hot
    cells). Steady-state cost when nothing exceeds the cap (r13 trim
    — the r12 shape paid a groupBy+count joined back onto every
    bucket row, ~+1.4 s on llm09 at sf0.1): ONE map-side-combined
    group count (tiny: one row per distinct bucket key) plus a
    driver-side emptiness probe of its > max_bucket filter; when no
    bucket is hot, the plain all-pairs self-join runs untouched. Only
    when a flood exists does the split engage, and then via broadcast
    semi/anti joins against the (tiny, hot-only) key set — map-side,
    no extra shuffle on the skewed key. The probe makes the physical
    plan data-dependent (an eager action inside the operator, like
    the callers' signature materialization) — the price of not taxing
    every healthy run for the adversarial case.

    ``buckets`` must have columns ``keys`` + ``_id`` (+ ``_ph`` when
    ``with_hamming`` — the banded-MinHash caller has no signature to
    XOR, only bucket membership) + any passthroughs already folded
    into ``keys``."""
    a, b = buckets.alias("a"), buckets.alias("b")
    key_eq = None
    for k in keys:
        eq = F.col(f"a.{k}") == F.col(f"b.{k}")
        key_eq = eq if key_eq is None else (key_eq & eq)
    sig_cols = ["_id", "_ph"] if with_hamming else ["_id"]

    def pairs(left, right, cond):
        out_cols = [F.col("a._id").alias("a"),
                    F.col("b._id").alias("b")]
        out_cols += [F.col(f"a.{k}").alias(k) for k in keys
                     if k.startswith("_")]
        if with_hamming:
            out_cols.append(F.bit_count(F.col("a._ph")
                                        .bitwiseXOR(F.col("b._ph")))
                            .alias("hamming"))
        return (left.join(right, cond & (F.col("a._id") < F.col("b._id")))
                .select(*out_cols))

    if max_bucket is None:
        return pairs(a, b, key_eq)
    # deliberately NOT cached: the frame is tiny and the flood path
    # references it lazily past this function's lifetime — a cache
    # here could never be unpersisted safely and would leak pinned
    # storage per invocation; recomputing the aggregate reads the
    # caller-cached buckets frame with map-side combine (cheap)
    hot_keys = (buckets.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_bn"))
                .filter(F.col("_bn") > max_bucket)
                .drop("_bn"))
    if not hot_keys.head(1):
        # steady state: no bucket exceeds the cap — the guard costs
        # one tiny aggregate and the exact self-join runs untouched
        return pairs(a, b, key_eq)
    cold = buckets.join(F.broadcast(hot_keys), keys, "left_anti")
    hot = buckets.join(F.broadcast(hot_keys), keys, "left_semi")
    ca, cb = cold.alias("a"), cold.alias("b")
    cold_pairs = pairs(ca, cb, key_eq)
    # representatives: one row per hot bucket — tiny, broadcast it so
    # the flood side never shuffles on its own (skewed) key
    reps = (hot.groupBy(*keys)
            .agg(F.min_by(F.struct(*sig_cols), "_id").alias("_r"))
            .select(*keys, *[F.col(f"_r.{c}").alias(c)
                             for c in sig_cols]))
    ha, hb = F.broadcast(reps).alias("a"), hot.alias("b")
    star_pairs = pairs(ha, hb, key_eq)
    return cold_pairs.unionByName(star_pairs)


def signature_candidates(sigs: DataFrame, chunks: int = 4,
                         max_bucket: int | None = 10_000) -> DataFrame:
    """Chunk-pigeonhole candidate pairs over ANY ``(_id, _ph)``
    64-bit-signature frame — the banding is signature-agnostic, so
    this one join serves image pHash, audio spectrogram pHash, and
    any future 64-bit perceptual hash: equal 16-bit chunk
    (pigeonhole-complete for Hamming ≤ chunks−1 BELOW the bucket cap)
    ⇒ (a, b, hamming). Rank or threshold on ``hamming`` downstream.
    Buckets larger than ``max_bucket`` degrade to a star join
    (``_capped_bucket_pairs``: O(n) per flooded bucket, connectivity
    preserved through the representative) — a pair whose ONLY shared
    chunk sits in a capped bucket may be missed unless near the
    representative; pass ``max_bucket=None`` for exact (unbounded)
    all-pairs completeness."""
    w = 64 // chunks
    chunk_arr = F.array(*[
        F.struct(F.lit(ci).alias("chunk"),
                 F.shiftright("_ph", ci * w)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("ck"))
        for ci in range(chunks)])
    buckets = (sigs.select("_id", "_ph",
                           F.explode(chunk_arr).alias("_c"))
               .select("_id", "_ph", "_c.chunk", "_c.ck")).cache()
    if max_bucket is None:
        # decode must run once, not per join side; with the cap armed
        # the hot-key probe materializes the cache instead (guide §2.4)
        buckets.count()
    return (_capped_bucket_pairs(buckets, ["chunk", "ck"], max_bucket)
            .select("a", "b", "hamming")
            .distinct())


def phash_candidates(df: DataFrame, id_col: str, image_col: str,
                     chunks: int = 4,
                     max_bucket: int | None = 10_000) -> DataFrame:
    """Near-dup image candidate pairs: ``phash_signatures`` (one
    decode pass) fed through the signature-agnostic
    ``signature_candidates`` chunk join — see that docstring for the
    completeness/cap contract."""
    return signature_candidates(
        phash_signatures(df, id_col, image_col),
        chunks=chunks, max_bucket=max_bucket)


# -- video near-dup: frame-sampled pHash sequences ----------------------------


def video_phash_signatures(df: DataFrame, id_col: str, video_col: str,
                           n_frames: int = 8,
                           skip_invalid: bool = True) -> DataFrame:
    """(_id, _phs array<long>) per video: pHashes of ``n_frames``
    index-uniform sampled frames (positions ``floor(i·(n−1)/(k−1))``
    — deterministic, layout-agnostic across MP4 / MKV / VID
    containers, and aligned between a video and its re-encode as long
    as frames map 1:1, which re-encoding preserves). Only the sampled
    frames are sliced and decoded — the index walk reads container
    tables, never payloads (the ``_frame_offsets`` contract). A video
    shorter than ``n_frames`` signs every frame."""
    from rakam_api_collector_spark.operators.multimodal import \
        _frame_offsets

    out = T.StructType([T.StructField("_id", T.LongType()),
                        T.StructField("_phs",
                                      T.ArrayType(T.LongType()))])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["_id"], pdf["_vid"]):
                data = bytes(raw)
                try:
                    offs = list(_frame_offsets(data))
                    n = len(offs)
                    if n == 0:
                        raise ValueError("video with zero frames")
                    k = min(n_frames, n)
                    picks = sorted({(i * (n - 1)) // max(k - 1, 1)
                                    for i in range(k)})
                    sig = [phash_of_image_bytes(
                        data[off:off + ln])
                        for _idx, off, ln in (offs[p] for p in picks)]
                    rows.append([int(rid), sig])
                except (ValueError, struct_error, IndexError):
                    if not skip_invalid:
                        raise
            yield pd.DataFrame(rows, columns=["_id", "_phs"])

    return (df.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(video_col).alias("_vid"))
            .mapInPandas(run, out))


def video_phash_candidates(df: DataFrame, id_col: str, video_col: str,
                           n_frames: int = 8, chunks: int = 4,
                           frame_hamming: int = 10,
                           min_match_frac: float = 0.5,
                           max_bucket: int | None = 10_000) -> DataFrame:
    """Near-dup video pairs: two videos are candidates when SOME
    sampled position's frame hashes share a 16-bit chunk (pigeonhole,
    as in ``phash_candidates``), and survive when ≥ ``min_match_frac``
    of compared positions match at Hamming ≤ ``frame_hamming``.
    Returns (a, b, n_positions, n_matched, mean_hamming). The join is
    keyed (position, chunk, value) — re-encoded/brightness-shifted
    copies align position-wise; videos of different lengths compare
    over the shorter signature. Signatures join, never frames.
    Flooded (position, chunk, value) buckets past ``max_bucket``
    degrade to the star join (``_capped_bucket_pairs``)."""
    w = 64 // chunks
    sigs = video_phash_signatures(df, id_col, video_col,
                                  n_frames=n_frames)
    pos = (sigs.select("_id", F.posexplode("_phs").alias("_p", "_ph")))
    chunk_arr = F.array(*[
        F.struct(F.lit(ci).alias("chunk"),
                 F.shiftright("_ph", ci * w)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("ck"))
        for ci in range(chunks)])
    buckets = (pos.select("_id", "_p", "_ph",
                          F.explode(chunk_arr).alias("_c"))
               .select("_id", "_p", "_ph", "_c.chunk", "_c.ck")).cache()
    buckets.count()              # decode runs once, not per join side
    pair_frames = (_capped_bucket_pairs(buckets, ["_p", "chunk", "ck"],
                                        max_bucket)
                   .select("a", "b", F.col("_p").alias("p"), "hamming")
                   .distinct())
    n_pos = sigs.select(F.col("_id"),
                        F.size("_phs").alias("_n"))
    return (pair_frames
            .filter(F.col("hamming") <= frame_hamming)
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_matched"),
                 F.avg("hamming").alias("mean_hamming"))
            .join(n_pos.select(F.col("_id").alias("a"),
                               F.col("_n").alias("_na")), "a")
            .join(n_pos.select(F.col("_id").alias("b"),
                               F.col("_n").alias("_nb")), "b")
            .withColumn("n_positions", F.least("_na", "_nb"))
            .filter(F.col("n_matched")
                    >= F.ceil(F.col("n_positions")
                              * F.lit(min_match_frac)))
            .select("a", "b", "n_positions", "n_matched",
                    F.round("mean_hamming", 4).alias("mean_hamming")))


# -- audio near-dup: spectrogram pHash ----------------------------------------


def clamped_band_columns(feats: "np.ndarray", n_cols: int = 9,
                         clamp: float = 6.0):
    """``audio_phash64``'s pre-pooling transform, shared: clamp the
    log-mel matrix ``clamp`` units below its peak, return it with the
    floor-index band-column edges. The llm54 fixture calibration
    (multimodal._staircase_tone_levels) targets THIS pooling — sharing
    the transform means a future grid change (clamp depth, column
    count) cannot silently diverge the calibration from the hash."""
    feats = np.maximum(feats, feats.max() - clamp)
    cols = (np.arange(n_cols + 1) * feats.shape[1]) // n_cols
    return feats, cols


def audio_phash64(pcm16: "np.ndarray", sample_rate: int, *,
                  n_fft: int = 512, hop: int = 256,
                  n_mels: int = 40) -> int:
    """64-bit perceptual hash of mono int16 audio — the
    Haitsma-Kalker band-energy-difference construction (ISMIR 2002,
    "A Highly Robust Audio Fingerprinting System") at clip
    granularity: pool the log-mel spectrogram
    (operators/spectrogram.py) into an 8×9 time×band energy grid,
    bit(t, b) = E(t, b) > E(t, b+1) — 64 sign-of-difference bits.

    Why differences and not the image pHash: a spectrogram is SPARSE
    (most bins sit at the log floor), so half the DCT block's
    coefficients land near zero == near the median, and ±1-quantum
    re-encode noise flips them — measured 16+ bits on an identical
    clip. Adjacent-band differences compare structure directly:
    equal-floor cells tie to a stable 0 and tonal peaks dominate
    their neighbors by orders of magnitude. Samples peak-normalize
    first and log compression turns residual gain into a constant
    both sides of every difference share — gain cancels exactly.
    Clips shorter than one FFT window raise (no spectrum to hash)."""
    from rakam_api_collector_spark.operators.spectrogram import \
        log_mel_frames

    x = np.asarray(pcm16, dtype=np.float64)
    peak = np.abs(x).max() if len(x) else 0.0
    if peak > 0:
        x = x * (32767.0 / peak)
    feats = log_mel_frames(x, sample_rate, n_fft=n_fft, hop=hop,
                           n_mels=n_mels)
    n_t = feats.shape[0]
    if n_t == 0:
        raise ValueError("clip shorter than one FFT window")
    # clamp re-quantization noise 60 dB below the peak, then mean-pool
    # to the 8×9 grid (floor-index time edges — short clips repeat)
    feats, cols = clamped_band_columns(feats)
    t_edges = (np.arange(9) * n_t) // 8
    grid = np.empty((8, 9))
    for ti in range(8):
        rows = feats[t_edges[ti]:max(t_edges[ti + 1], t_edges[ti] + 1)]
        for bi in range(9):
            grid[ti, bi] = rows[:, cols[bi]:max(cols[bi + 1],
                                                cols[bi] + 1)].mean()
    bits = (grid[:, :-1] > grid[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0].astype(np.int64,
                                                       casting="unsafe"))


def audio_phash_signatures(df: DataFrame, id_col: str, audio_col: str,
                           skip_invalid: bool = True,
                           **spec_kw) -> DataFrame:
    """(_id, _ph) per WAV clip — decode + spectrogram + pHash in ONE
    Arrow pass; corrupt/too-short clips follow drop-vs-raise.
    Candidate pairs: feed this signature frame straight into
    ``signature_candidates`` (the banding is signature-agnostic, cap
    included) — see ``audio_phash_candidates``."""
    from rakam_api_collector_spark.operators.multimodal import \
        wav_decode

    out = T.StructType([T.StructField("_id", T.LongType()),
                        T.StructField("_ph", T.LongType())])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["_id"], pdf["_a"]):
                try:
                    rate, ch, pcm = wav_decode(bytes(raw))
                    x = np.frombuffer(pcm, dtype="<i2")
                    if ch > 1:
                        x = x[:len(x) - len(x) % ch] \
                            .reshape(-1, ch).mean(axis=1)
                    rows.append([int(rid),
                                 audio_phash64(np.asarray(x), rate,
                                               **spec_kw)])
                except (ValueError, struct_error):
                    if not skip_invalid:
                        raise
            yield pd.DataFrame(rows, columns=["_id", "_ph"])

    return (df.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(audio_col).alias("_a"))
            .mapInPandas(run, out))


def audio_phash_candidates(df: DataFrame, id_col: str, audio_col: str,
                           chunks: int = 4,
                           max_bucket: int | None = 10_000,
                           **spec_kw) -> DataFrame:
    """Near-dup audio candidate pairs: ``audio_phash_signatures`` (one
    decode + spectrogram pass) through the signature-agnostic
    ``signature_candidates`` chunk join — audio-modality dedup with
    the same completeness/cap contract as the image path."""
    return signature_candidates(
        audio_phash_signatures(df, id_col, audio_col, **spec_kw),
        chunks=chunks, max_bucket=max_bucket)
