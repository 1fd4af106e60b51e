"""Perceptual image hashing (operators/phash.py): the invariances
pHash exists for — re-encode, pixel-double resize, uniform brightness
shift — keep Hamming distance near 0 while unrelated images land far
apart; the banded candidate join finds exactly the near-dup pairs.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rakam_api_collector_spark.operators import multimodal as M
from rakam_api_collector_spark.operators.phash import (phash64,
                                                       phash_candidates,
                                                       phash_signatures)


def _gradient(w=32, h=32, seed=0):
    """A structured image: smooth gradient + a blob, so the DCT
    low-frequency block carries real signal (noise images hash to
    coin flips by design)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = (x * 3 + y * 2) % 256
    cy, cx = rng.integers(8, 24, size=2)
    blob = 120 * np.exp(-(((y - cy) ** 2 + (x - cx) ** 2) / 40.0))
    g = np.clip(img + blob, 0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def _ham(a, b):
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_invariances_and_separation():
    base = _gradient(seed=1)
    h0 = phash64(32, 32, 3, base.tobytes())

    # pixel-doubling resize: floor-index downscale recovers the
    # original exactly → identical hash
    doubled = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert phash64(64, 64, 3, doubled.tobytes()) == h0

    # uniform brightness shift moves DC, barely the median-relative bits
    brighter = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    assert _ham(phash64(32, 32, 3, brighter.tobytes()), h0) <= 6

    # grayscale of the same luma content matches closely
    gray = (0.299 * base[:, :, 0] + 0.587 * base[:, :, 1]
            + 0.114 * base[:, :, 2]).astype(np.uint8)
    assert _ham(phash64(32, 32, 1, gray.tobytes()), h0) <= 4

    # an unrelated structured image lands far away
    other = _gradient(seed=2)[::-1, ::-1]
    assert _ham(phash64(32, 32, 3, other.tobytes()), h0) >= 16

    with pytest.raises(ValueError, match="pixel buffer"):
        phash64(32, 32, 3, base.tobytes()[:-1])


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), shift=st.integers(-30, 30))
def test_brightness_shift_property(seed, shift):
    base = _gradient(seed=seed)
    shifted = np.clip(base.astype(int) + shift, 0, 255).astype(np.uint8)
    d = _ham(phash64(32, 32, 3, base.tobytes()),
             phash64(32, 32, 3, shifted.tobytes()))
    # clipping saturation makes large shifts non-uniform, so
    # median-adjacent bits can flip; the property that matters is
    # d ≪ the ~32-bit expectation for unrelated images. Measured
    # tail: max 18 bits over 300 seeds × shifts ±30 (worst at the
    # clipping extremes) — bound with margin below random.
    assert d <= 22, f"brightness {shift} moved {d} bits"


def test_signatures_and_candidates_over_spark(spark):
    """PNG-encoded duplicates (one re-encoded at 2× size) pair up at
    hamming ≤ 2 through the banded join; the unrelated image pairs
    with neither; a corrupt blob drops (skip) or raises."""
    base = _gradient(seed=3)
    doubled = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    other = _gradient(seed=4)[::-1, ::-1]
    rows = [
        (1, M.png_encode(base.tobytes(), 32, 32, 3)),
        (2, M.png_encode(doubled.tobytes(), 64, 64, 3)),
        (3, M.png_encode(other.tobytes(), 32, 32, 3)),
        (4, b"corrupt image bytes"),
    ]
    df = spark.createDataFrame(rows, "img_id long, image binary")

    sigs = {r._id: r._ph for r in
            phash_signatures(df, "img_id", "image").collect()}
    assert set(sigs) == {1, 2, 3}
    assert sigs[1] == sigs[2]

    pairs = {(r.a, r.b): r.hamming for r in
             phash_candidates(df, "img_id", "image").collect()}
    assert pairs.get((1, 2)) == 0
    assert all(h <= 2 for (a, b), h in pairs.items()
               if (a, b) == (1, 2))
    # the unrelated image may chunk-collide by chance only at high
    # hamming; assert it never shows as a NEAR dup
    assert all(h > 10 for (a, b), h in pairs.items() if 3 in (a, b))

    with pytest.raises(Exception, match="PNG|SOI|signature"):
        phash_signatures(df, "img_id", "image",
                         skip_invalid=False).collect()


def test_video_phash_near_dup(spark):
    """Video near-dup: a re-encoded copy (identical pixels, fresh PNG
    encode) and a brightness-shifted copy pair with the original at
    high matched-position fractions; an unrelated video never
    survives the match threshold; a corrupt blob drops."""
    from rakam_api_collector_spark.operators.phash import (
        video_phash_candidates, video_phash_signatures)

    def vid(frames):
        return M.pack_video([M.png_encode(f.tobytes(), 32, 32, 3)
                             for f in frames])

    base_frames = [_gradient(seed=s) for s in range(10, 22)]
    bright = [np.clip(f.astype(int) + 20, 0, 255).astype(np.uint8)
              for f in base_frames]
    other = [_gradient(seed=s)[::-1, ::-1] for s in range(40, 52)]
    rows = [(1, vid(base_frames)),
            (2, vid(base_frames)),          # re-encode: same pixels
            (3, vid(bright)),
            (4, vid(other)),
            (5, b"not a video")]
    df = spark.createDataFrame(rows, "vid_id long, video binary")

    sigs = {r._id: r._phs for r in
            video_phash_signatures(df, "vid_id", "video",
                                   n_frames=6).collect()}
    assert set(sigs) == {1, 2, 3, 4}
    assert sigs[1] == sigs[2] and len(sigs[1]) == 6

    pairs = {(r.a, r.b): r for r in
             video_phash_candidates(df, "vid_id", "video",
                                    n_frames=6).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].n_matched == 6
    assert pairs[(1, 2)].mean_hamming == 0.0
    assert (1, 3) in pairs and pairs[(1, 3)].n_matched >= 3
    assert all(4 not in (a, b) for a, b in pairs)


def test_audio_phash_invariances(spark):
    """Audio near-dup: gain changes and 8-bit re-encodes keep the
    spectrogram hash close; a different tone mixture lands far; a
    too-short clip and a corrupt blob follow drop-vs-raise."""
    from rakam_api_collector_spark.operators.phash import (
        audio_phash64, audio_phash_signatures)

    rate = 8000
    t = np.arange(rate) / rate

    def mix(freqs, amp=0.4):
        x = sum(np.sin(2 * np.pi * f * t + i) for i, f in
                enumerate(freqs))
        return (amp * 32767 * x / len(freqs)).astype("<i2")

    base = mix([440.0, 1200.0, 2500.0])
    quiet = (base.astype(np.float64) * 0.25).astype("<i2")   # −12 dB
    other = mix([600.0, 1800.0, 3300.0])

    h0 = audio_phash64(base, rate)
    assert _ham(audio_phash64(quiet, rate), h0) <= 10        # gain
    assert _ham(audio_phash64(other, rate), h0) >= 16        # content

    rows = [(1, M.wav_encode(base.tobytes(), rate, 1)),
            (2, M.wav_encode(quiet.tobytes(), rate, 1)),
            (3, M.wav_encode(other.tobytes(), rate, 1)),
            (4, M.wav_encode(base[:100].tobytes(), rate, 1)),  # short
            (5, b"junk")]
    df = spark.createDataFrame(rows, "clip_id long, audio binary")
    sigs = {r._id: r._ph for r in
            audio_phash_signatures(df, "clip_id", "audio").collect()}
    assert set(sigs) == {1, 2, 3}
    assert sigs[1] == h0
    assert _ham(sigs[1], sigs[2]) <= 10
    assert _ham(sigs[1], sigs[3]) >= 16


def test_hot_bucket_cap_degrades_to_star_join(spark):
    """Adversarial mass-duplication: N identical all-black thumbnails
    share ONE pHash, flooding every chunk bucket. Uncapped, the
    candidate join is O(N²) in the flood; with max_bucket it degrades
    to the star join — O(N) pairs, all through the min-id
    representative, every member still CONNECTED for downstream
    clustering — while pairs outside the flood stay exact."""
    black = M.png_encode(bytes(32 * 32 * 3), 32, 32, 3)
    base = _gradient(seed=7)
    near = np.clip(base.astype(int) + 3, 0, 255).astype(np.uint8)
    rows = [(i, black) for i in range(100, 120)] + [
        (1, M.png_encode(base.tobytes(), 32, 32, 3)),
        (2, M.png_encode(near.tobytes(), 32, 32, 3))]
    df = spark.createDataFrame(rows, "img_id long, image binary")

    capped = phash_candidates(df, "img_id", "image",
                              max_bucket=5).collect()
    flood = [(r.a, r.b) for r in capped if r.a >= 100]
    # star, not all-pairs: 19 member→rep edges, rep = min id 100
    assert sorted(flood) == [(100, b) for b in range(101, 120)]
    assert all(r.hamming == 0 for r in capped if r.a >= 100)
    # the cold pair is untouched by the cap
    assert [(r.a, r.b) for r in capped
            if r.a < 100 and r.hamming <= 10] == [(1, 2)]

    # uncapped reference: the same flood is all-pairs (the O(N²)
    # degeneracy the cap exists for)
    uncapped = phash_candidates(df, "img_id", "image",
                                max_bucket=None).collect()
    assert len([r for r in uncapped if r.a >= 100]) == 19 * 20 // 2


def test_audio_phash_candidates_end_to_end(spark):
    """Audio-modality near-dup through the shared signature join: the
    gain-shifted copy pairs with the original at low Hamming; the
    different tone mixture pairs with neither below the near-dup
    threshold; corrupt/short clips drop before the join."""
    from rakam_api_collector_spark.operators.phash import \
        audio_phash_candidates

    rate = 8000
    t = np.arange(rate) / rate

    def mix(freqs, amp=0.4):
        x = sum(np.sin(2 * np.pi * f * t + i) for i, f in
                enumerate(freqs))
        return (amp * 32767 * x / len(freqs)).astype("<i2")

    base = mix([440.0, 1200.0, 2500.0])
    quiet = (base.astype(np.float64) * 0.25).astype("<i2")
    other = mix([600.0, 1800.0, 3300.0])
    rows = [(1, M.wav_encode(base.tobytes(), rate, 1)),
            (2, M.wav_encode(quiet.tobytes(), rate, 1)),
            (3, M.wav_encode(other.tobytes(), rate, 1)),
            (4, b"junk")]
    df = spark.createDataFrame(rows, "clip_id long, audio binary")
    pairs = {(r.a, r.b): r.hamming for r in
             audio_phash_candidates(df, "clip_id", "audio").collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert all(h > 10 for (a, b), h in pairs.items() if 3 in (a, b))
    assert all(4 not in (a, b) for (a, b) in pairs)


def test_tone_staircase_writes_pattern_into_hash(spark):
    """The llm54 fixture contract (multimodal.synthesize_tone_wav):
    closed-loop calibration makes every audio_phash64 time row spell
    the clip's 8-bit pattern exactly (bit b of the MSB-first row byte
    = pattern bit b), identically at every gain variant — so gain
    variants of one pattern hash at distance 0 and distinct patterns
    share no 16-bit chunk (the candidate join surfaces exactly the
    same-pattern pairs, with zero cross-pattern cells)."""
    from rakam_api_collector_spark.operators.phash import (
        audio_phash_candidates, audio_phash_signatures)

    pats = [0x07, 0x10, 0xA9, 0xFA]          # distinct, mixed runs
    gains = [900, 450, 225, 112]
    rows = [(len(gains) * pi + gi, 8000, 4000, p, g)
            for pi, p in enumerate(pats) for gi, g in enumerate(gains)]
    df = spark.createDataFrame(
        rows, "clip_id long, rate int, nf int, pattern int, gm int")
    clips = M.synthesize_tone_wav(df, "clip_id", "rate", "nf",
                                  "pattern", "gm")
    sigs = {r._id: r._ph for r in
            audio_phash_signatures(clips, "id", "blob").collect()}
    assert len(sigs) == 16
    for pi, p in enumerate(pats):
        expect = int(format(p, "08b")[::-1], 2)   # row byte is MSB-first
        for gi in range(len(gains)):
            h = sigs[len(gains) * pi + gi] & 0xFFFFFFFFFFFFFFFF
            assert [(h >> (8 * r)) & 0xFF for r in range(8)] \
                == [expect] * 8, (p, gi)

    pairs = [(r.a, r.b, r.hamming) for r in
             audio_phash_candidates(clips, "id", "blob").collect()]
    assert all(h == 0 and a // 4 == b // 4 for a, b, h in pairs)
    assert len(pairs) == len(pats) * 6       # C(4,2) per pattern, no cross


def test_tone_staircase_calibration_fails_loudly():
    """A pattern the chain cannot realize must raise, not emit a
    drifting fixture: with one tone (no adjacent pair) the staircase
    is fine, but an impossible frequency set (all tones in ONE pooled
    column — adjacent comparisons are floor ties) cannot hold any
    margin."""
    from rakam_api_collector_spark.operators.multimodal import \
        _staircase_tone_levels

    with pytest.raises(ValueError, match="staircase calibration"):
        _staircase_tone_levels(0x55, 8000, 4000,
                               tuple(float(f) for f in
                                     (1000, 1001, 1002, 1003, 1004,
                                      1005, 1006, 1007, 1008)))
