"""Log-mel spectrogram extraction (operators/spectrogram.py): the
behavioral physics — a pure tone's energy lands in the mel bin that
contains it, silence sits at the log floor — plus framing exactness,
the Spark map path, and shape fuzz.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import multimodal as M
from rakam_api_collector_spark.operators.spectrogram import (
    LOG_FLOOR, hz_to_mel, log_mel_frames, mel_filterbank, mel_to_hz,
    wav_log_mel)


def _tone(freq, rate=16000, sec=0.5, amp=0.5):
    t = np.arange(int(rate * sec)) / rate
    return (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype("<i2")


def test_mel_scale_inverts_and_filterbank_shapes():
    hz = np.array([0.0, 440.0, 1000.0, 7999.0])
    assert np.allclose(mel_to_hz(hz_to_mel(hz)), hz)
    fb = mel_filterbank(16000, 512, 40)
    assert fb.shape == (40, 257)
    # unit-peak triangles SAMPLED at FFT bin frequencies: maxima are
    # ≤ 1 (the continuous peak usually falls between bins), positive
    # for every filter
    assert fb.min() >= 0.0 and fb.max() <= 1.0
    assert all(fb[m].max() > 0.5 for m in range(40))
    with pytest.raises(ValueError, match="nyquist"):
        mel_filterbank(16000, 512, 40, fmin=100, fmax=9000)


@pytest.mark.parametrize("freq", [440.0, 1500.0, 4000.0])
def test_pure_tone_energy_lands_in_its_mel_bin(freq):
    feats = log_mel_frames(_tone(freq), 16000, n_fft=512, hop=256,
                           n_mels=40)
    assert feats.shape[1] == 40
    mean = feats.mean(axis=0)
    # the argmax mel filter's center must bracket the tone frequency
    fb = mel_filterbank(16000, 512, 40)
    centers = mel_to_hz(np.linspace(hz_to_mel(0.0),
                                    hz_to_mel(8000.0), 42))
    m = int(mean.argmax())
    assert centers[m] <= freq <= centers[m + 2], \
        f"{freq} Hz peaked in filter {m} [{centers[m]:.0f}, " \
        f"{centers[m + 2]:.0f}]"


def test_silence_floors_and_framing_is_exact():
    silent = np.zeros(5000, dtype="<i2")
    feats = log_mel_frames(silent, 16000, n_fft=512, hop=256)
    assert feats.shape == ((5000 - 512) // 256 + 1, 40)
    assert np.allclose(feats, np.log10(LOG_FLOOR))
    # shorter than one window: zero frames, not an error
    assert log_mel_frames(silent[:100], 16000).shape == (0, 40)
    # tail samples short of a full window drop (pure function of
    # bytes, no padding): one extra hop's worth adds exactly 1 frame
    a = log_mel_frames(silent[:512 + 255], 16000).shape[0]
    b = log_mel_frames(silent[:512 + 256], 16000).shape[0]
    assert (a, b) == (1, 2)


def test_wav_log_mel_spark_path(spark):
    """Stereo mixdown, per-row map plan, corrupt-clip drop-vs-raise,
    and flat features reshaping to (n_frames, n_mels)."""
    tone = _tone(1000.0, rate=8000, sec=0.25)
    stereo = np.empty(tone.size * 2, dtype="<i2")
    stereo[0::2] = tone
    stereo[1::2] = tone
    rows = [(1, M.wav_encode(tone.tobytes(), 8000, 1)),
            (2, M.wav_encode(stereo.tobytes(), 8000, 2)),
            (3, b"not a wav at all")]
    df = spark.createDataFrame(rows, "clip_id long, audio binary")

    out = wav_log_mel(df, "clip_id", "audio", n_fft=256, hop=128,
                      n_mels=20)
    got = {r.clip_id: r for r in out.collect()}
    assert set(got) == {1, 2}                    # corrupt clip dropped
    for r in got.values():
        assert r.sample_rate == 8000 and r.n_mels == 20
        assert len(r.features) == r.n_frames * r.n_mels
    mono = np.array(got[1].features).reshape(-1, 20)
    duo = np.array(got[2].features).reshape(-1, 20)
    # identical-channel stereo mixes down to the mono features
    assert np.allclose(mono, duo)
    # the 1 kHz tone dominates the same mel bin as the pure function
    direct = log_mel_frames(tone, 8000, n_fft=256, hop=128, n_mels=20)
    assert np.allclose(mono, direct)

    with pytest.raises(Exception, match="RIFF"):
        wav_log_mel(df, "clip_id", "audio",
                    skip_invalid=False).collect()

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan                # one scan, no shuffle


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 4000), rate=st.sampled_from([8000, 16000]),
       n_fft=st.sampled_from([64, 256, 512]),
       hop=st.sampled_from([32, 128, 256]), seed=st.integers(0, 2**31))
def test_any_shape_never_crashes(n, rate, n_fft, hop, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, size=n).astype("<i2")
    feats = log_mel_frames(x, rate, n_fft=n_fft, hop=hop, n_mels=12)
    want = (n - n_fft) // hop + 1 if n >= n_fft else 0
    assert feats.shape == (want, 12)
    assert np.isfinite(feats).all()
