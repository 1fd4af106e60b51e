"""Log-mel spectrogram extraction — the audio feature-extract stage
(decode → FEATURES → model) that completes the multimodal quartet:
decode (``multimodal.wav_decode``), feature-extract (here), resize
(``nn_resize``), frame-sample (``sample_video_frames``).

Pure-numpy (rfft + matmul — no audio library this container lacks),
run as ONE ``mapInPandas`` pass over WAV bytes: per-row map, no
shuffle, feature matrices cross Arrow once. The standard recipe
(HTK-convention mel filterbank, the shape speech pipelines feed to
encoders):

1. decode to int16 PCM, mix channels to mono, scale to [-1, 1);
2. frame with ``n_fft`` window / ``hop`` step (no padding — partial
   tail frames drop, so features are a pure function of the bytes);
3. periodic Hann window → |rFFT|² power spectrum;
4. mel filterbank (``n_mels`` triangular filters, HTK formula
   ``mel = 2595 · log10(1 + hz/700)``, filters normalized to unit
   peak) → ``log10(max(power, floor))``.

Determinism: one machine's BLAS/FFT gives byte-stable output (the
pytest pins run same-session); cross-platform reproducibility is
last-ulp like every float pipeline — consumers hashing features
across heterogeneous fleets should round, as the PQ/k-means docstrings
already prescribe for embedding artifacts.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_FLOOR = 1e-10


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64)
                             / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64)
                             / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0,
                   fmax: float | None = None) -> "np.ndarray":
    """(n_mels, n_fft//2 + 1) triangular filters — unit CONTINUOUS
    peak, sampled at the FFT bin frequencies (so sampled maxima are
    ≤ 1) — centers equally spaced on the HTK mel scale between fmin
    and fmax."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    if not 0 <= fmin < fmax <= sample_rate / 2.0:
        raise ValueError(f"need 0 <= fmin < fmax <= nyquist, got "
                         f"({fmin}, {fmax}) at rate {sample_rate}")
    n_bins = n_fft // 2 + 1
    centers = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                    n_mels + 2))
    freqs = np.arange(n_bins) * (sample_rate / n_fft)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = centers[m], centers[m + 1], centers[m + 2]
        up = (freqs - lo) / max(mid - lo, 1e-12)
        down = (hi - freqs) / max(hi - mid, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def log_mel_frames(pcm16: "np.ndarray", sample_rate: int, *,
                   n_fft: int = 512, hop: int = 256,
                   n_mels: int = 40, fmin: float = 0.0,
                   fmax: float | None = None) -> "np.ndarray":
    """(n_frames, n_mels) float64 log10-mel energies from mono int16
    samples; zero frames when the clip is shorter than one window."""
    if n_fft < 2 or hop < 1:
        raise ValueError("need n_fft >= 2 and hop >= 1")
    x = pcm16.astype(np.float64) / 32768.0
    n = (len(x) - n_fft) // hop + 1 if len(x) >= n_fft else 0
    if n <= 0:
        return np.zeros((0, n_mels))
    idx = (np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :])
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(n_fft) / n_fft)      # periodic Hann
    power = np.abs(np.fft.rfft(x[idx] * window, axis=1)) ** 2
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    return np.log10(np.maximum(power @ fb.T, LOG_FLOOR))


_OUT = T.StructType([
    T.StructField("_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_mels", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def wav_log_mel(df: DataFrame, id_col: str, audio_col: str, *,
                n_fft: int = 512, hop: int = 256, n_mels: int = 40,
                fmin: float = 0.0, fmax: float | None = None,
                skip_invalid: bool = True) -> DataFrame:
    """(id, sample_rate, n_frames, n_mels, features) per clip —
    ``features`` is the row-major flattened (n_frames × n_mels)
    matrix (Arrow moves one flat buffer; reshape is metadata).
    Channels mix to mono by mean before framing. Corrupt/compressed
    WAVs follow the ST11 drop-vs-raise contract via
    ``skip_invalid``."""
    from rakam_api_collector_spark.operators.multimodal import \
        wav_decode

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
                    feats = log_mel_frames(
                        np.asarray(x), rate, n_fft=n_fft, hop=hop,
                        n_mels=n_mels, fmin=fmin, fmax=fmax)
                except ValueError:
                    if skip_invalid:
                        continue
                    raise
                rows.append([int(rid), rate, feats.shape[0],
                             n_mels, feats.ravel().tolist()])
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _OUT.fields])

    return (df.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(audio_col).alias("_a"))
            .mapInPandas(run, _OUT)
            .withColumnRenamed("_id", id_col))
