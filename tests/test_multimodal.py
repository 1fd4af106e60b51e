"""PNG codec + multimodal decode plumbing (operators/multimodal.py).

The decode path is pinned to the PUBLIC PNG SPEC two independent ways:
(1) a hand-assembled PNG whose filtered scanline bytes were derived by
hand from the spec's filter definitions (so the unfilter code is tested
against the spec, not against this repo's own encoder), and (2) the
llm14 oracle, which recomputes decoded-pixel statistics from the
closed-form pixel rule with no PNG code on the oracle side.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators import multimodal as M


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF))


def _png(width, height, ctype, filtered_stream) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered_stream)))
            + _chunk(b"IEND", b""))


def test_png_decode_matches_spec_hand_filtered():
    """4x4 gray image; each scanline uses a different filter type with
    filtered bytes derived BY HAND from the spec (§9.2 Sub, Up,
    Average, Paeth) — decoding must reproduce the plaintext rows."""
    rows = [[10, 20, 30, 40], [15, 25, 35, 45],
            [20, 30, 40, 50], [25, 35, 45, 55]]
    # ft=1 Sub:  10, then +10 deltas           -> [10,10,10,10]
    # ft=2 Up:   row - prev                    -> [5,5,5,5]
    # ft=3 Avg:  20-(0+15)//2=13; 30-(20+25)//2=8; 8; 8
    # ft=4 Paeth: predictors 20,30,40,50 (up)  -> [5,5,5,5]
    stream = bytes([1, 10, 10, 10, 10,
                    2, 5, 5, 5, 5,
                    3, 13, 8, 8, 8,
                    4, 5, 5, 5, 5])
    w, h, c, px = M.png_decode(_png(4, 4, 0, stream))
    assert (w, h, c) == (4, 4, 1)
    assert list(px) == [v for row in rows for v in row]


def test_png_roundtrip_all_shapes():
    """Encoder cycles filter types 0-4; decode must invert every one,
    across gray/GA/RGB/RGBA and degenerate 1x1."""
    for wd, ht, ch in [(8, 5, 1), (16, 11, 3), (3, 7, 4), (1, 1, 1),
                       (9, 6, 2), (2, 10, 3)]:
        n = wd * ht * ch
        px = ((np.arange(n) * 7 + 13) % 256).astype(np.uint8).tobytes()
        w2, h2, c2, px2 = M.png_decode(M.png_encode(px, wd, ht, ch))
        assert (w2, h2, c2, px2) == (wd, ht, ch, px)


def test_png_decode_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        M.png_decode(b"\x00" * 32)
    good = M.png_encode(bytes(4), 2, 2, 1)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF                       # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        M.png_decode(bytes(bad_crc))
    # 16-bit depth decodes (high-byte reduction): a 1x1 sample 0xAB00
    # comes back as the single byte 0xAB
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    deep = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\xab\x00"))
            + _chunk(b"IEND", b""))
    assert M.png_decode(deep) == (1, 1, 1, b"\xab")


def test_decode_image_stats_distributed(spark):
    """decode_image over a blob column: stats match a direct numpy
    computation on the same synthetic pixels; blob never appears in the
    output schema (narrowest-columns rule)."""
    spec = spark.createDataFrame(
        [(i, 4 + i % 3, 3 + i % 2, [1, 3, 4][i % 3]) for i in range(12)],
        "doc_id long, w int, h int, c int")
    blobs = M.synthesize_png(spec, "doc_id", "w", "h", "c")
    out = M.decode_image(blobs, "id").orderBy("id")
    assert "blob" not in out.columns
    for r in out.collect():
        n = r.width * r.height * r.channels
        arr = (r.id * 31 + np.arange(n) * 7) % 256
        assert r.n_samples == n
        assert r.px_sum == int(arr.sum())
        assert r.px_wsum == int((np.arange(n) * arr).sum())
        assert (r.px_min, r.px_max) == (int(arr.min()), int(arr.max()))


def test_wav_decode_matches_spec_hand_assembled():
    """Hand-built RIFF stream with an unknown LIST chunk (must skip), an
    odd-length chunk (word-alignment pad), and int16-LE samples written
    by hand — decode must walk chunks per the RIFF spec."""
    pcm = struct.pack("<4h", 100, -200, 300, -32768)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    odd = b"zzz"                                  # 3 bytes → 1 pad byte
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    rate, ch, out = M.wav_decode(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (8000, 2)
    assert struct.unpack("<4h", out) == (100, -200, 300, -32768)


def test_codecs_reject_degenerate_headers(spark):
    """channels=0 WAV and zero-dimension PNG must raise ValueError (not
    ZeroDivisionError / numpy reduction errors), so skip_invalid
    poison-pill modes actually drop them instead of killing the job."""
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)   # channels=0
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    zero_ch = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="channel"):
        M.wav_decode(zero_ch)
    ihdr = struct.pack(">IIBBBBB", 0, 4, 8, 0, 0, 0, 0)   # width=0
    zero_w = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
              + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="dimension"):
        M.png_decode(zero_w)
    # end-to-end: poison-pill mode survives both
    adf = spark.createDataFrame([(1, zero_ch)], "i long, blob binary")
    assert M.decode_audio(adf, "i", skip_invalid=True).collect() == []
    idf = spark.createDataFrame([(1, zero_w)], "i long, blob binary")
    assert M.decode_image(idf, "i", skip_invalid=True).collect() == []


def test_wav_roundtrip_and_rejects():
    s = np.arange(-500, 500, 7, dtype="<i2").tobytes()
    rate, ch, out = M.wav_decode(M.wav_encode(s, 16000, 1))
    assert (rate, ch, out) == (16000, 1, s)
    with pytest.raises(ValueError, match="RIFF"):
        M.wav_decode(b"\x00" * 64)
    # float32 WAV (format tag 3) now decodes: one 0.0 sample → silence
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    assert M.wav_decode(
        b"RIFF" + struct.pack("<I", len(body)) + body) == \
        (8000, 1, b"\x00\x00")
    # a genuinely compressed tag (MPEG layer 3 = 0x55) must fail loudly
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 32000, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="format tag"):
        M.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_decode_rejects_truncated_chunks():
    """A truncated data chunk must fail decode even when the remaining
    bytes happen to be frame-aligned (would otherwise yield plausible
    stats from partial audio), and a short fmt chunk must fail before
    the struct unpack."""
    s = np.arange(0, 64, dtype="<i2").tobytes()      # 128 bytes PCM
    wav = M.wav_encode(s, 8000, 1)
    # chop 2 bytes off the end: data declares 128 but only 126 remain —
    # still a whole number of mono frames, so only the length check
    # catches it
    with pytest.raises(ValueError, match="truncated"):
        M.wav_decode(wav[:-2])
    # fmt chunk body shorter than the canonical 16 bytes
    fmt = struct.pack("<HHII", 1, 1, 8000, 16000)    # 12 bytes only
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="fmt chunk too short"):
        M.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_video_sampler_skips_undecodable_frames(spark):
    """The sampler must never decode unsampled frames: a container
    whose off-stride frames are GARBAGE (undecodable as PNG) still
    samples fine — proof of the skip-by-length-prefix contract."""
    good = M.png_encode(bytes(range(6)), 3, 2, 1)
    frames = [good if idx % 3 == 0 else b"not-a-png" for idx in range(7)]
    df = spark.createDataFrame([(1, M.pack_video(frames))],
                               "vid long, blob binary")
    out = M.sample_video_frames(df, "vid", every=3).collect()
    assert [r.frame_idx for r in out] == [0, 3, 6]
    assert all((r.width, r.height) == (3, 2) for r in out)
    assert out[0].px_sum == sum(range(6))


def test_timed_video_header_roundtrip():
    """VID1 carries fps_milli; VID0 stays headerless; both index walks
    agree on frame offsets."""
    frames = [M.png_encode(bytes(range(6)), 3, 2, 1) for _ in range(3)]
    v0, v1 = M.pack_video(frames), M.pack_video(frames, fps_milli=1500)
    assert M._video_header(v0) == (None, 3, 8)
    assert M._video_header(v1) == (1500, 3, 12)
    assert ([ln for _, _, ln in M._frame_offsets(v0)]
            == [ln for _, _, ln in M._frame_offsets(v1)])
    with pytest.raises(ValueError, match="fps_milli"):
        M.pack_video(frames, fps_milli=0)


def test_time_sample_indices_arithmetic():
    """The instant→frame map is floor(t_ms*fps_milli/1e6), so 0.5 fps
    at 7 s stride hits frames 0,3,7,10… and a stride shorter than one
    frame duration repeats the frame across instants."""
    assert M._time_sample_indices(12, 500, 7000) == [
        (0, 0), (7000, 3), (14000, 7), (21000, 10)]
    # 1 fps sampled every 400 ms: frames repeat until the next second
    assert M._time_sample_indices(2, 1000, 400) == [
        (0, 0), (400, 0), (800, 0), (1200, 1), (1600, 1)]
    assert M._time_sample_indices(0, 1000, 400) == []


def test_timed_video_sampler_skips_unsampled_and_decodes_once(spark):
    """Time-based sampling must never decode unsampled frames (garbage
    off-sample frames are fine) and must emit one row per sample
    INSTANT, repeating a slow-fps frame's stats rather than re-decoding
    it."""
    good = M.png_encode(bytes(range(6)), 3, 2, 1)
    # 0.5 fps, sampled every 7 s → frames 0, 3 sampled (of 5); others garbage
    frames = [good if idx in (0, 3) else b"junk" for idx in range(5)]
    df = spark.createDataFrame(
        [(1, M.pack_video(frames, fps_milli=500))], "vid long, blob binary")
    out = M.sample_video_frames_by_time(df, "vid", every_ms=7000).collect()
    assert [(r.sample_ms, r.frame_idx) for r in out] == [(0, 0), (7000, 3)]
    # stride below frame duration: same frame repeats per instant
    df2 = spark.createDataFrame(
        [(2, M.pack_video([good, good], fps_milli=1000))],
        "vid long, blob binary")
    out2 = M.sample_video_frames_by_time(df2, "vid", every_ms=400).collect()
    assert [(r.sample_ms, r.frame_idx) for r in out2] == [
        (0, 0), (400, 0), (800, 0), (1200, 1), (1600, 1)]
    assert all(r.px_sum == sum(range(6)) for r in out2)


def test_timed_sampler_rejects_untimed_container(spark):
    """An untimed VID0 blob cannot be time-sampled: default fails, and
    skip_invalid drops the container (ST11 accounting path)."""
    good = M.png_encode(bytes(range(6)), 3, 2, 1)
    timed = M.pack_video([good], fps_milli=1000)
    df = spark.createDataFrame(
        [(1, M.pack_video([good])), (2, timed)], "vid long, blob binary")
    with pytest.raises(Exception, match="VID1|timed"):
        M.sample_video_frames_by_time(df, "vid", every_ms=500).collect()
    out = M.sample_video_frames_by_time(
        df, "vid", every_ms=500, skip_invalid=True).collect()
    # the VID0 row drops; the timed row keeps both its instants (1 fps
    # every 500 ms → frame 0 at t=0 and t=500)
    assert [(r.id, r.sample_ms) for r in out] == [(2, 0), (2, 500)]


def test_decode_image_skip_invalid(spark):
    """Poison-pill mode: undecodable blobs drop (accounted as
    n_in - n_out by the caller, the ST11 contract); default fails."""
    good = M.png_encode(bytes(range(4)), 2, 2, 1)
    truncated = good[:20]
    df = spark.createDataFrame(
        [(1, good), (2, b"junk"), (3, truncated)], "i long, blob binary")
    out = M.decode_image(df, "i", skip_invalid=True).collect()
    assert [r.id for r in out] == [1]
    with pytest.raises(Exception):
        M.decode_image(df, "i").collect()


def test_resize_image_nearest_neighbor(spark):
    """Resize must apply the floor index map exactly, preserve channel
    count, and survive upscale (index map repeats source pixels)."""
    # 2x2 RGB with distinct corner colors
    px = bytes([255, 0, 0,  0, 255, 0,
                0, 0, 255,  9, 9, 9])
    df = spark.createDataFrame([(7, M.png_encode(px, 2, 2, 3))],
                               "img long, blob binary")
    up = M.resize_image(df, "img", out_w=4, out_h=4).collect()[0]
    assert (up.width, up.height, up.channels) == (4, 4, 3)
    w2, h2, c2, out = M.png_decode(bytes(up.blob))
    arr = np.frombuffer(out, dtype=np.uint8).reshape(4, 4, 3)
    # floor map: dst 0,1 -> src 0; dst 2,3 -> src 1
    assert list(arr[0, 0]) == [255, 0, 0] and list(arr[0, 3]) == [0, 255, 0]
    assert list(arr[3, 0]) == [0, 0, 255] and list(arr[3, 3]) == [9, 9, 9]
    down = M.resize_image(df, "img", out_w=1, out_h=1).collect()[0]
    _, _, _, one = M.png_decode(bytes(down.blob))
    assert list(one) == [255, 0, 0]          # floor map picks (0,0)


def test_resample_audio_frame_map(spark):
    """Zero-order-hold resample: frame map src=(dst*in)//out, all
    channels of a frame move together, ceil-length output; upsample
    repeats frames per the same map."""
    frames = np.array([[100, -100], [200, -200], [300, -300]],
                      dtype="<i2")                    # 3 frames, stereo
    df = spark.createDataFrame(
        [(1, M.wav_encode(frames.tobytes(), 6000, 2))],
        "i long, blob binary")
    # downsample 6000 -> 4000: n_out = ceil(3*4000/6000) = 2,
    # src frames = (0*6000)//4000=0, (1*6000)//4000=1
    down = M.resample_audio(df, "i", out_rate=4000).collect()[0]
    assert (down.sample_rate, down.channels, down.n_frames) == (4000, 2, 2)
    _, _, pcm = M.wav_decode(bytes(down.blob))
    assert np.frombuffer(pcm, dtype="<i2").reshape(-1, 2).tolist() == \
        [[100, -100], [200, -200]]
    # upsample 6000 -> 12000: n_out = 6, each src frame twice
    up = M.resample_audio(df, "i", out_rate=12000).collect()[0]
    _, _, pcm = M.wav_decode(bytes(up.blob))
    got = np.frombuffer(pcm, dtype="<i2").reshape(-1, 2).tolist()
    assert got == [[100, -100], [100, -100], [200, -200],
                   [200, -200], [300, -300], [300, -300]]


def test_audio_video_skip_invalid(spark):
    """skip_invalid parity on the audio and video stages: bad clips /
    bad SAMPLED frames drop; defaults fail fast."""
    s = np.arange(-100, 100, 5, dtype="<i2").tobytes()
    adf = spark.createDataFrame(
        [(1, M.wav_encode(s, 8000, 1)), (2, b"not-wav")],
        "i long, blob binary")
    out = M.decode_audio(adf, "i", skip_invalid=True).collect()
    assert [r.id for r in out] == [1]
    with pytest.raises(Exception):
        M.decode_audio(adf, "i").collect()

    good = M.png_encode(bytes(range(4)), 2, 2, 1)
    vids = spark.createDataFrame(
        [(1, M.pack_video([good, b"junk", good])),   # junk IS sampled
         (2, b"not-a-container")],
        "i long, blob binary")
    out = M.sample_video_frames(vids, "i", every=1,
                                skip_invalid=True).collect()
    assert [(r.id, r.frame_idx) for r in out] == [(1, 0), (1, 2)]
    with pytest.raises(Exception):
        M.sample_video_frames(vids, "i", every=1).collect()


def test_attach_blob_and_byte_features(spark):
    """Codec-free byte-statistics path still works (decode_features)."""
    docs = spark.createDataFrame([(1, "ab"), (2, "")],
                                 "doc_id long, text string")
    blobbed = M.attach_blob(docs, "text")
    meta = {r.doc_id: r.meta.n_bytes for r in blobbed.collect()}
    assert meta == {1: 2, 2: 0}
    feats = {r.id: r.features
             for r in M.decode_features(blobbed, "doc_id").collect()}
    assert feats[1][0] == 2.0 and feats[2] == [0.0] * M.FEATURE_DIM


def test_palette_png_decode_and_rejects():
    """Color type 3: indices expand through PLTE to RGB; missing PLTE
    and out-of-range indices fail decode."""
    palette = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])   # R,G,B
    idx = bytes([0, 1, 2, 2, 1, 0])                        # 3x2
    w, h, ch, px = M.png_decode(M.png_encode_palette(idx, 3, 2, palette))
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255,
                        0, 0, 255, 0, 255, 0, 255, 0, 0])
    # out-of-range index
    with pytest.raises(ValueError, match="palette index"):
        M.png_decode(M.png_encode_palette(bytes([3] * 6), 3, 2, palette))
    # missing PLTE: hand-build type-3 PNG without the chunk
    import struct as st
    import zlib as zl
    raw = bytes([0, 0, 0])                                  # 1 row, 2 px
    ihdr = st.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    blob = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
            + M._png_chunk(b"IDAT", zl.compress(raw))
            + M._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="missing PLTE"):
        M.png_decode(blob)


def test_palette_png_through_decode_image(spark):
    palette = bytes(range(0, 30))                           # 10 entries
    idx = bytes([9, 0, 5, 5])                               # 2x2
    df = spark.createDataFrame(
        [(1, M.png_encode_palette(idx, 2, 2, palette))], ["id", "blob"])
    row = M.decode_image(df, "id").collect()[0]
    assert (row.width, row.height, row.channels) == (2, 2, 3)
    exp = [palette[i * 3 + c] for i in idx for c in range(3)]
    assert row.px_sum == sum(exp)
    assert row.px_min == min(exp) and row.px_max == max(exp)


def test_adam7_interlaced_decode_matches_plain():
    """Adam7 decode must reproduce exactly the pixels the plain encoding
    carries, across channel counts, non-multiple-of-8 dims, degenerate
    1-pixel rows/columns (empty passes), and with per-pass filtering."""
    for wd, ht, ch in [(8, 8, 1), (13, 7, 3), (1, 1, 1), (5, 3, 4),
                       (2, 9, 2), (9, 1, 1), (1, 9, 1), (16, 11, 3)]:
        n = wd * ht * ch
        px = ((np.arange(n) * 7 + 3) % 256).astype(np.uint8).tobytes()
        assert M.png_decode(M.png_encode_adam7(px, wd, ht, ch)) \
            == (wd, ht, ch, px), (wd, ht, ch)
        # interlaced and plain encodings of the same pixels agree
        assert M.png_decode(M.png_encode(px, wd, ht, ch)) \
            == M.png_decode(M.png_encode_adam7(px, wd, ht, ch))


def test_16bit_png_decodes_to_high_bytes():
    """Depth 16: filtering operates on 2-byte-per-sample units and the
    decoder emits each big-endian sample's high byte (the spec's 16->8
    rendering reduction); filtered 16-bit scanlines must unfilter at
    the 2-byte unit, not per byte."""
    s16 = ((np.arange(4 * 3 * 1) * 4097 + 11) % 65536)
    be = s16.astype(">u2").tobytes()
    stride = 4 * 2
    raw = bytearray()
    for y in range(3):
        # Sub filter at bpp=2 exercises the unit-width subtlety
        raw.append(1)
        line = be[y * stride:(y + 1) * stride]
        raw.extend((line[x] - (line[x - 2] if x >= 2 else 0)) & 0xFF
                   for x in range(stride))
    ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    w, h, c, px = M.png_decode(blob)
    assert (w, h, c) == (4, 3, 1)
    assert list(px) == list((s16 >> 8).astype(np.uint8))
    # 16-bit palette is invalid per spec and must fail loudly
    ihdr3 = struct.pack(">IIBBBBB", 2, 1, 16, 3, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr3)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit indexed"):
        M.png_decode(bad)
    # depths 1/2/4 stay out of scope
    ihdr1 = struct.pack(">IIBBBBB", 2, 1, 4, 0, 0, 0, 0)
    low = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr1)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        M.png_decode(low)


def test_wav_8_and_24_bit_decode_to_int16():
    """8-bit unsigned maps to (v-128)<<8 and 24-bit keeps its top 16
    bits (sign intact) — the depth reductions that keep decode_audio's
    stats uniform across real-world WAV depths."""
    def wav(bits, pcm, ch=1, rate=8000):
        block = ch * bits // 8
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block,
                          bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    r, c, out = M.wav_decode(wav(8, bytes([0, 128, 255, 200])))
    assert (r, c) == (8000, 1)
    assert np.frombuffer(out, "<i2").tolist() == [
        -32768, 0, 32512, (200 - 128) << 8]
    s24 = [0x7FFFFF, -0x800000, 0x123456, -0x000100]
    pcm24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little")
                     for v in s24)
    r, c, out = M.wav_decode(wav(24, pcm24))
    assert np.frombuffer(out, "<i2").tolist() == [v >> 8 for v in s24]
    # frame alignment is depth-aware: 4 bytes is not a whole number of
    # 24-bit mono frames
    with pytest.raises(ValueError, match="whole number"):
        M.wav_decode(wav(24, b"\x00" * 4))
    with pytest.raises(ValueError, match="bit depth"):
        M.wav_decode(wav(32, b"\x00" * 4))


def test_jpeg_codec_and_mixed_container_decode(spark):
    """Real baseline JPEG (operators/jpeg.py): uniform blocks decode
    exactly (closed form: only the quantized DC survives), smooth
    content round-trips within ±2 at q95 in 4:4:4 AND 4:2:0, the stream
    is deterministic, and decode_image consumes PNG and JPEG blobs in
    the same column via container sniffing."""
    from rakam_api_collector_spark.operators import jpeg as J

    # closed-form: uniform gray decodes to exactly the input value
    assert J.jpeg_decode(J.jpeg_encode(bytes([100] * 64), 8, 8, 1)) \
        == (8, 8, 1, bytes([100] * 64))
    # smooth gradient bound, both subsampling modes + gray
    for ch, sub in [(1, False), (3, False), (3, True)]:
        W, H = 24, 17
        base = np.linspace(0, 255, W * H * ch).astype(np.uint8).tobytes()
        blob = J.jpeg_encode(base, W, H, ch, quality=95, subsample=sub)
        assert blob == J.jpeg_encode(base, W, H, ch, quality=95,
                                     subsample=sub)
        w, h, c, out = J.jpeg_decode(blob)
        assert (w, h, c) == (W, H, ch)
        err = np.abs(np.frombuffer(out, np.uint8).astype(int)
                     - np.frombuffer(base, np.uint8).astype(int))
        assert err.max() <= 2, (ch, sub, err.max())
    # arithmetic coding must fail loudly, not garble
    arith = bytearray(J.jpeg_encode(bytes(64), 8, 8, 1))
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(ValueError, match="baseline/progressive"):
        J.jpeg_decode(bytes(arith))
    # a sequential scan mislabeled SOF2 has an invalid spectral range
    # for a progressive scan (Ss=0, Se=63) — error, not garbage
    prog = bytearray(J.jpeg_encode(bytes(64), 8, 8, 1))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="spectral"):
        J.jpeg_decode(bytes(prog))

    # mixed-container column through decode_image
    gray = bytes([7] * 64)
    df = spark.createDataFrame(
        [(1, M.png_encode(gray, 8, 8, 1)),
         (2, J.jpeg_encode(gray, 8, 8, 1))], ["id", "blob"])
    rows = {r.id: r for r in M.decode_image(df, "id").collect()}
    assert rows[1].px_sum == 7 * 64
    assert rows[2].px_sum == 7 * 64           # uniform JPEG is exact
    assert rows[1].width == rows[2].width == 8


def test_codec_fuzz_error_types_are_catchable():
    """Poison-pill contract across ALL codecs: random byte corruption
    must surface only as ValueError / struct.error / zlib.error — the
    exact tuple decode_image/decode_audio/sample_video_frames catch in
    skip_invalid mode. Any other exception type would kill the Spark
    task instead of dead-lettering the blob."""
    import random

    from rakam_api_collector_spark.operators import jpeg as J

    rng = random.Random(5)
    caught = (ValueError, struct.error, zlib.error)

    def fuzz(blob, decode, n=250):
        for _ in range(n):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode(bytes(b))
            except caught:
                pass
        # any other exception type propagates and fails the test

    px = ((np.arange(16 * 11 * 3) * 7) % 256).astype(np.uint8).tobytes()
    fuzz(M.png_encode(px, 16, 11, 3), M.png_decode)
    fuzz(M.png_encode_adam7(px, 16, 11, 3), M.png_decode)
    pcm = np.arange(-300, 300, 3, dtype="<i2").tobytes()
    fuzz(M.wav_encode(pcm, 8000, 2), M.wav_decode)
    fuzz(J.jpeg_encode(px, 16, 11, 3, quality=90), J.jpeg_decode)
    # compressed WAV variants walk extra code paths (companding tables,
    # ADPCM block headers/step indexes, fact truncation)
    fuzz(M.wav_encode_g711(M.ulaw_encode(pcm), 8000, 1, "ulaw"),
         M.wav_decode)
    fuzz(M.wav_encode_g711(M.alaw_encode(pcm), 8000, 1, "alaw"),
         M.wav_decode)
    fuzz(M.wav_encode_adpcm(pcm, 8000, 2, samples_per_block=49),
         M.wav_decode)


def test_interlaced_palette_png_decodes():
    """Feature composition: an Adam7-interlaced palette (type 3) PNG —
    index scanlines unfilter per pass at bpp=1, scatter on the pass
    grid, then expand through PLTE to RGB."""
    W, H = 9, 5
    idx = bytes(((np.arange(W * H) * 3) % 5).astype(np.uint8))
    palette = bytes(range(15))
    raw = bytearray()
    for x0, y0, dx, dy in M._ADAM7:
        pw = (W - x0 + dx - 1) // dx
        ph = (H - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            raw.append(0)
            y = y0 + j * dy
            for k in range(pw):
                raw.append(idx[y * W + x0 + k * dx])
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 3, 0, 0, 1)
    blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    exp = b"".join(palette[j * 3:(j + 1) * 3] for j in idx)
    assert M.png_decode(blob) == (W, H, 3, exp)


def test_jpeg_422_decode(spark):
    """The asymmetric-factor upsample path (4:2:2 — luma 2×1): a
    hand-rolled 4:2:2 stream built from the codec's own primitives must
    decode within ±1 on smooth content, including non-multiple-of-MCU
    dims (20×9)."""
    from rakam_api_collector_spark.operators import jpeg as J

    def encode_422(pixels, W, H, quality=95):
        img = (np.frombuffer(pixels, np.uint8).astype(np.float64)
               .reshape(H, W, 3))
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def havg(p):
            if p.shape[1] % 2:
                p = np.pad(p, ((0, 0), (0, 1)), mode="edge")
            return p.reshape(p.shape[0], p.shape[1] // 2, 2).mean(axis=2)

        def grid(p, mh, mw):
            ph, pw = -(-p.shape[0] // mh) * mh, -(-p.shape[1] // mw) * mw
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                        mode="edge")
            return pp.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)

        qs = [J._scale_q(J._Q_LUMA, quality),
              J._scale_q(J._Q_CHROMA, quality)]
        out = bytearray(b"\xff\xd8")
        for tid, q in enumerate(qs):
            body = bytes([tid]) + bytes(int(v) for v in
                                        q.flatten()[J._ZIGZAG])
            out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
        sof = struct.pack(">BHHB", 8, H, W, 3)
        sof += bytes([1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        for tc, tb in [(0x00, J._DC_LUMA), (0x10, J._AC_LUMA),
                       (0x01, J._DC_CHROMA), (0x11, J._AC_CHROMA)]:
            body = bytes([tc]) + bytes(tb[0]) + bytes(tb[1])
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        luma = grid(y, 8, 16)
        cbg, crg = grid(havg(cb), 8, 8), grid(havg(cr), 8, 8)
        dc = [J._canonical_codes(*J._DC_LUMA)] + \
            [J._canonical_codes(*J._DC_CHROMA)] * 2
        ac = [J._canonical_codes(*J._AC_LUMA)] + \
            [J._canonical_codes(*J._AC_CHROMA)] * 2
        qsel = [qs[0], qs[1], qs[1]]
        w = J._BitWriter()
        preds = [0, 0, 0]
        for my in range(luma.shape[0]):
            for mx in range(luma.shape[1] // 2):
                for bx in range(2):
                    preds[0] = J._encode_component(
                        [luma[my, mx * 2 + bx]], qsel[0], dc[0], ac[0],
                        w, preds[0])
                for ci, gr in ((1, cbg), (2, crg)):
                    preds[ci] = J._encode_component(
                        [gr[my, mx]], qsel[ci], dc[ci], ac[ci], w,
                        preds[ci])
        out += w.flush() + b"\xff\xd9"
        return bytes(out)

    for W, H in [(16, 8), (20, 9), (8, 8)]:
        base = np.linspace(0, 255, W * H * 3).astype(np.uint8).tobytes()
        dw, dh, dc_, px = J.jpeg_decode(encode_422(base, W, H))
        assert (dw, dh, dc_) == (W, H, 3)
        err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                     - np.frombuffer(base, np.uint8).astype(int))
        assert err.max() <= 1, (W, H, err.max())


def test_g711_tables_match_spec_landmarks():
    """Decode tables pin the public G.711 landmarks: μ-law spans
    ±32124 with both zero codes (0xFF = +0, 0x7F = -0) decoding to 0,
    A-law spans ±32256 with minimum magnitude 8 (no true zero), and
    both tables are monotone within each sign half."""
    u, a = M._g711_decode_tables()
    assert (int(u.min()), int(u.max())) == (-32124, 32124)
    assert u[0xFF] == 0 and u[0x7F] == 0
    assert (int(a.min()), int(a.max())) == (-32256, 32256)
    assert int(np.abs(a).min()) == 8
    # sign-half monotonicity: decoded magnitude grows with the code's
    # (segment, mantissa) ordinal
    for table, xor in ((u, 0xFF), (a, 0x55)):
        pos = sorted(int(table[c]) for c in range(256)
                     if (c ^ xor) & 0x80 == (0x80 if table is a else 0))
        assert pos == sorted(set(pos)) or len(set(pos)) >= 127


def test_g711_code_roundtrip_identity():
    """encode(decode(code)) == code for every A-law code and every
    μ-law code except 0x7F (-0, whose canonical re-encoding is the +0
    code 0xFF) — the involution property that pins encoder and decoder
    against each other."""
    codes = np.arange(256, dtype=np.uint8)
    ru = np.frombuffer(M.ulaw_encode(
        M._g711_decode_tables()[0][codes].astype("<i2").tobytes()), np.uint8)
    ra = np.frombuffer(M.alaw_encode(
        M._g711_decode_tables()[1][codes].astype("<i2").tobytes()), np.uint8)
    assert all(ra[c] == c for c in range(256))
    assert all(ru[c] == c for c in range(256) if c != 0x7F)
    assert ru[0x7F] == 0xFF


def test_wav_decode_g711_formats(spark):
    """WAV files with format tags 7 (μ-law) and 6 (A-law) decode to the
    expanded int16 stream; G.711 at a non-8-bit depth raises; the
    quantization error of a full encode→wav→decode trip is bounded by
    the largest segment step."""
    s = np.linspace(-30000, 30000, 101).astype("<i2").tobytes()
    for law, table in zip(("ulaw", "alaw"), M._g711_decode_tables()):
        enc = M.ulaw_encode(s) if law == "ulaw" else M.alaw_encode(s)
        wav = M.wav_encode_g711(enc, 8000, 1, law)
        rate, ch, pcm = M.wav_decode(wav)
        assert (rate, ch) == (8000, 1)
        got = np.frombuffer(pcm, "<i2")
        want = table[np.frombuffer(enc, np.uint8)]
        assert np.array_equal(got, want)
        err = np.abs(got.astype(int)
                     - np.frombuffer(s, "<i2").astype(int))
        assert err.max() <= 1024            # top-segment step bound
    # non-8-bit G.711 is invalid
    body = (b"WAVE" + b"fmt "
            + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="8 bits"):
        M.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_audio_g711_through_spark(spark):
    """decode_audio consumes a μ-law clip like any PCM clip — the
    expansion happens inside the same mapInPandas stage, stats are over
    the expanded int16 stream."""
    s = np.int16([0, 1000, -1000, 30000]).tobytes()
    wav = M.wav_encode_g711(M.ulaw_encode(s), 8000, 1, "ulaw")
    df = spark.createDataFrame([(1, wav)], "clip long, blob binary")
    out = M.decode_audio(df, "clip").collect()[0]
    want = M._g711_decode_tables()[0][np.frombuffer(M.ulaw_encode(s), np.uint8)]
    assert out.n_frames == 4
    assert out.amp_sum == int(want.astype(int).sum())
    assert out.amp_min == int(want.min()) and out.amp_max == int(want.max())


def test_synthesize_video_null_fps_yields_untimed_container(spark):
    """A null fps_milli row must produce an untimed VID0 container (the
    per-row opt-out), not crash: Arrow→pandas delivers null ints as
    NaN, which the builder must null-check with isna."""
    spec = spark.createDataFrame(
        [(1, 2, 3, 2, 1000), (2, 2, 3, 2, None)],
        "doc_id long, nf int, w int, h int, fpsm int")
    vids = M.synthesize_video(spec, "doc_id", "nf", "w", "h",
                              fps_milli_col="fpsm").collect()
    blobs = {r.id: bytes(r.blob) for r in vids}
    assert M._video_header(blobs[1])[:2] == (1000, 2)
    assert M._video_header(blobs[2])[:2] == (None, 2)


def test_ima_adpcm_decode_matches_spec_hand_derived():
    """One block derived BY HAND from the IMA spec: predictor 100 at
    step index 0 (step 7), nibbles 0..7 → diffs 0,1,3,4,7,12,20,41 with
    index walking 0,0,0,0,2,6,12,20 — pins the step table, diff
    formula, clamping, and low-nibble-first packing against the spec,
    not this repo's encoder."""
    block = (struct.pack("<hBx", 100, 0)
             + bytes([0x10, 0x32, 0x54, 0x76]))
    pcm = M._ima_adpcm_decode(block, 1, len(block))
    got = list(np.frombuffer(pcm, "<i2"))
    assert got == [100, 100, 101, 104, 108, 115, 127, 147, 188]
    with pytest.raises(ValueError, match="step index"):
        M._ima_adpcm_decode(struct.pack("<hBx", 0, 89) + bytes(4), 1, 8)
    with pytest.raises(ValueError, match="block align"):
        M._ima_adpcm_decode(bytes(8), 1, 3)


def test_wav_adpcm_roundtrip_and_fact_truncation():
    """encode→wav→decode: the fact chunk truncates block padding to the
    true sample count, stereo channels stay independent, and the
    quantization error of a slew-limited signal is small relative to
    full scale. A 4-bit depth mismatch raises."""
    t = np.arange(2000)
    x = (3000 * np.sin(t / 30) + 500 * np.sin(t / 7)).astype("<i2")
    rate, ch, pcm = M.wav_decode(
        M.wav_encode_adpcm(x.tobytes(), 8000, 1, samples_per_block=505))
    got = np.frombuffer(pcm, "<i2")
    assert (rate, ch, len(got)) == (8000, 1, 2000)   # fact-truncated
    assert np.abs(got.astype(int) - x.astype(int)).max() < 1500
    # stereo: right = -left must decode to mirrored streams
    x2 = np.stack([x, -x], axis=1).reshape(-1).astype("<i2")
    _, c2, p2 = M.wav_decode(
        M.wav_encode_adpcm(x2.tobytes(), 8000, 2, samples_per_block=249))
    g2 = np.frombuffer(p2, "<i2").reshape(-1, 2)
    assert c2 == 2 and len(g2) == 2000
    assert np.abs(g2[:, 0].astype(int) - x.astype(int)).max() < 1500
    assert np.abs(g2[:, 1].astype(int) + x.astype(int)).max() < 1500
    # ADPCM fmt with wrong bit depth
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 256, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="4 bits"):
        M.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_audio_adpcm_through_spark(spark):
    """decode_audio consumes an ADPCM clip in the same mapInPandas
    stage; stats equal a local decode of the same blob."""
    x = (np.cumsum(np.random.default_rng(7).integers(-80, 81, 800))
         .clip(-30000, 30000)).astype("<i2")
    wav = M.wav_encode_adpcm(x.tobytes(), 16000, 1, samples_per_block=401)
    want = np.frombuffer(M.wav_decode(wav)[2], "<i2").astype(int)
    df = spark.createDataFrame([(9, wav)], "clip long, blob binary")
    out = M.decode_audio(df, "clip").collect()[0]
    assert out.sample_rate == 16000 and out.n_frames == 800
    assert out.amp_sum == int(want.sum())
    assert (out.amp_min, out.amp_max) == (int(want.min()), int(want.max()))


def test_adpcm_rejects_misaligned_multichannel_block():
    """A stereo block_align that is not a whole number of 4-byte
    per-channel groups must raise (the walk would otherwise zero-fill
    the short channel — plausible silence instead of an error)."""
    with pytest.raises(ValueError, match="block align"):
        M._ima_adpcm_decode(bytes(20), 2, 20)   # 20-8=12, not %8


def test_adpcm_truncated_final_block_decodes_prefix():
    """Real-world IMA WAVs commonly carry a truncated FINAL block (the
    fact chunk records the true sample count): the decoder must emit
    the header + whatever whole nibble groups are present — an exact
    prefix of the full-block decode — instead of rejecting the file.
    A tail too short to even hold the block header is corrupt."""
    import numpy as np

    x = (np.sin(np.linspace(0, 40, 2000)) * 12000).astype("<i2")
    blocks, ba = M._ima_adpcm_encode(x.tobytes(), 1, 505)
    full = np.frombuffer(M._ima_adpcm_decode(blocks, 1, ba), dtype="<i2")
    part = np.frombuffer(
        M._ima_adpcm_decode(blocks[:-100], 1, ba), dtype="<i2")
    assert len(part) < len(full)
    assert np.array_equal(part, full[:len(part)])
    # stereo: a partial trailing GROUP (< 4·ch bytes) is ignored, whole
    # groups decode
    x2 = np.repeat(x[:992], 2).astype("<i2")
    blocks2, ba2 = M._ima_adpcm_encode(x2.tobytes(), 2, 249)
    full2 = np.frombuffer(M._ima_adpcm_decode(blocks2, 2, ba2), dtype="<i2")
    part2 = np.frombuffer(
        M._ima_adpcm_decode(blocks2[:-3], 2, ba2), dtype="<i2")
    assert len(part2) < len(full2)
    assert np.array_equal(part2, full2[:len(part2)])
    # shorter than the per-channel headers: corrupt, not truncated
    with pytest.raises(ValueError, match="tail"):
        M._ima_adpcm_decode(blocks + bytes(2), 1, ba)


def test_wav_float_decode_and_extensible():
    """IEEE float WAV (format tag 3) and the WAVE_FORMAT_EXTENSIBLE
    (0xFFFE) wrapper: float samples clamp to [-1, 1] and scale to
    int16 full scale; a float encoding of an int16 stream round-trips
    exactly; NaN maps to silence; a non-standard SubFormat GUID is
    rejected, not misread."""
    import numpy as np

    x16 = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype("<i2")
    f = x16.astype(np.float64) / 32767.0
    for bits in (32, 64):
        rate, ch, pcm = M.wav_decode(
            M.wav_encode_float(f, 16000, 1, bits=bits))
        assert (rate, ch) == (16000, 1)
        got = np.frombuffer(pcm, dtype="<i2")
        assert np.array_equal(got, x16), bits
    # extensible wrapper, stereo float32
    st = np.repeat(f[:200], 2)
    rate, ch, pcm = M.wav_decode(
        M.wav_encode_float(st, 8000, 2, extensible=True))
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(np.frombuffer(pcm, dtype="<i2"),
                          np.repeat(x16[:200], 2))
    # out-of-range samples clamp, NaN becomes silence
    weird = np.array([2.0, -3.0, float("nan"), 0.5], dtype=np.float32)
    _, _, pcm = M.wav_decode(M.wav_encode_float(weird, 8000, 1))
    assert list(np.frombuffer(pcm, dtype="<i2")) == \
        [32767, -32767, 0, 16384]
    # corrupt SubFormat GUID: fail loudly
    blob = bytearray(M.wav_encode_float(f[:8], 8000, 1, extensible=True))
    i = blob.index(b"\x9b\x71")
    blob[i:i + 2] = b"\x00\x00"
    with pytest.raises(ValueError, match="SubFormat"):
        M.wav_decode(bytes(blob))
    # odd float bit depth: fail loudly
    with pytest.raises(ValueError, match="32/64"):
        M.wav_encode_float(f[:8], 8000, 1, bits=16)


def test_decode_audio_float_through_spark(spark):
    """decode_audio consumes float WAVs through the same mapInPandas
    stage — stats equal the integer-PCM encoding of the same signal."""
    import numpy as np

    x16 = (np.sin(np.linspace(0, 9, 480)) * 12000).astype("<i2")
    rows = [(1, M.wav_encode(x16.tobytes(), 8000, 1)),
            (2, M.wav_encode_float(
                x16.astype(np.float64) / 32767.0, 8000, 1))]
    df = spark.createDataFrame(rows, "id long, blob binary")
    got = {r.id: r for r in M.decode_audio(df, "id").collect()}
    assert got[1].n_frames == got[2].n_frames == 480
    for fld in ("amp_sum", "amp_sqsum", "amp_min", "amp_max"):
        assert getattr(got[1], fld) == getattr(got[2], fld), fld


def test_jpeg_progressive_decodes_identical_to_baseline(spark):
    """Progressive JPEG (SOF2, spec Annex G): both scan scripts —
    spectral-selection-only and the full successive-approximation
    libjpeg-style script (DC@Al=1, AC bands @Al=1, AC refinements,
    DC refinement) — must decode BIT-identically to the baseline
    stream of the same image, because both encoders quantize
    identically and the baseline decoder is the oracle-verified one
    (llm44). Covers gray/RGB, odd dims, 4:2:0, flat blocks (EOB runs),
    impulse content (ZRL), and noise (dense refinement bits)."""
    from rakam_api_collector_spark.operators import jpeg as J

    rng = np.random.default_rng(4242)
    shapes = [(16, 16, 1, False), (21, 13, 3, False), (24, 24, 3, True),
              (37, 29, 3, True), (61, 8, 1, False)]
    contents = [
        lambda h, w, c: rng.integers(0, 256, (h, w, c)),        # noise
        lambda h, w, c: np.full((h, w, c), 77),                 # flat
        lambda h, w, c: _impulses(rng, h, w, c),                # ZRL
    ]
    for w, h, ch, sub in shapes:
        for make in contents:
            px = np.ascontiguousarray(
                make(h, w, ch).astype(np.uint8)).tobytes()
            for q in (25, 85):
                base = J.jpeg_decode(
                    J.jpeg_encode(px, w, h, ch, quality=q, subsample=sub))
                for so in (False, True):
                    prog = J.jpeg_decode(J.jpeg_encode_progressive(
                        px, w, h, ch, quality=q, subsample=sub,
                        spectral_only=so))
                    assert prog == base, (w, h, ch, sub, q, so)
    # progressive streams flow through the Spark decode stage untouched
    px = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8).tobytes()
    blob = J.jpeg_encode_progressive(px, 16, 16, 3)
    df = spark.createDataFrame([(5, blob)], "id long, blob binary")
    out = M.decode_image(df, "id").collect()[0]
    assert (out.width, out.height, out.channels) == (16, 16, 3)


def _impulses(rng, h, w, c):
    img = np.full((h, w, c), 128)
    for _ in range(8):
        img[rng.integers(0, h), rng.integers(0, w)] = rng.integers(0, 256)
    return img


def test_image_header_meta_reads_headers_only(spark):
    """image_meta answers from headers: PNG dims/depth/channels from
    IHDR (palette reports the LOGICAL 3 channels decode expands to),
    JPEG from the SOF walk — including progressive and even arithmetic
    streams the pixel decoder refuses — and the header-only claim is
    pinned by corrupting every byte AFTER the header and watching meta
    succeed where decode fails."""
    import numpy as np
    import pytest

    from rakam_api_collector_spark.operators import jpeg as J

    px = bytes(range(48)) * 4                       # 8x8 gray
    png8 = M.png_encode(px[:64], 8, 8, 1)
    png_rgb = M.png_encode((px * 3)[:8 * 4 * 3], 8, 4, 3)
    pal = M.png_encode_palette(bytes([i % 4 for i in range(36)]), 6, 6,
                               bytes([i for i in range(4)
                                      for _ in range(3)]))
    jpg = J.jpeg_encode(px[:64], 8, 8, 1, quality=90)
    jpg_prog = J.jpeg_encode_progressive(px[:64], 8, 8, 1, quality=90)

    assert M.image_header_meta(png8) == ("png", 8, 8, 1, 8)
    assert M.image_header_meta(png_rgb) == ("png", 8, 4, 3, 8)
    assert M.image_header_meta(pal) == ("png", 6, 6, 3, 8)
    assert M.image_header_meta(jpg) == ("jpeg", 8, 8, 1, 8)
    assert M.image_header_meta(jpg_prog) == ("jpeg", 8, 8, 1, 8)

    # header-only: trash everything after the PNG IHDR / first JPEG kB
    trashed_png = png8[:33] + b"\x00" * (len(png8) - 33)
    assert M.image_header_meta(trashed_png)[:3] == ("png", 8, 8)
    with pytest.raises(Exception):
        M.png_decode(trashed_png)

    with pytest.raises(ValueError):
        M.image_header_meta(b"not an image at all")

    # T.81 B.1.1.2 fill bytes (0xFF runs before a marker) are legal
    padded = jpg[:2] + b"\xff\xff\xff" + jpg[2:]
    assert M.image_header_meta(padded) == ("jpeg", 8, 8, 1, 8)

    df = spark.createDataFrame(
        [(1, png8), (2, jpg), (3, b"garbage")],
        "img long, blob binary")
    got = {r.id: (r.format, r.width, r.height, r.channels, r.bit_depth)
           for r in M.image_meta(df, "img", skip_invalid=True).collect()}
    assert got == {1: ("png", 8, 8, 1, 8), 2: ("jpeg", 8, 8, 1, 8)}


def test_trim_silence_exact_boundaries_and_idempotence(spark):
    """trim_silence cuts on whole-window boundaries around the loud
    span (exact integer rule), preserves interior silence, passes an
    all-loud clip untouched, empties an all-silent clip, handles a
    partial final window and stereo interleave, and is idempotent."""
    import numpy as np

    from rakam_api_collector_spark.operators.multimodal import (
        trim_silence,
        wav_decode,
        wav_encode,
    )

    win = 8

    def pcm(segments, ch=1):
        # segments: list of (n_frames, amplitude); interleave channels
        s = np.concatenate([np.full(n * ch, a, dtype="<i2")
                            for n, a in segments] or
                           [np.zeros(0, dtype="<i2")])
        return wav_encode(s.tobytes(), 8000, ch)

    rows = [
        # id 0: 20 silent + 13 loud + 19 silent frames (mono). Loud
        # span covers windows 2..4 → frames [16, 40); 40 > 33 clamps
        # to... nothing: window 4 ends at 40 ≤ 52 total, no clamp.
        (0, pcm([(20, 0), (13, 2000), (19, 0)])),
        # id 1: all loud, partial final window (10 frames) — untouched
        (1, pcm([(10, 900)])),
        # id 2: all silent → zero frames
        (2, pcm([(30, 5)])),
        # id 3: stereo, loud only in the tail's partial window
        (3, pcm([(16, 0), (3, 1200)], ch=2)),
        # id 4: interior silence is content — kept
        (4, pcm([(8, 700), (8, 0), (8, 700)])),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    got = {r["id"]: r for r in
           trim_silence(df, "id", threshold=328, window=win).collect()}

    assert (got[0]["start_frame"], got[0]["end_frame"]) == (16, 40)
    assert got[0]["n_frames"] == 24
    rate, ch, p = wav_decode(bytes(got[0]["blob"]))
    assert (rate, ch) == (8000, 1)
    s0 = np.frombuffer(p, dtype="<i2")
    assert len(s0) == 24 and s0[4] == 2000 and s0[0] == 0  # window pad

    assert (got[1]["start_frame"], got[1]["end_frame"]) == (0, 10)
    assert got[2]["n_frames"] == 0 == got[2]["start_frame"]
    assert (got[3]["start_frame"], got[3]["end_frame"]) == (16, 19)
    assert got[3]["channels"] == 2
    assert (got[4]["start_frame"], got[4]["end_frame"]) == (0, 24)

    # idempotence: trimming the trimmed clips changes nothing
    trimmed = spark.createDataFrame(
        [(r["id"], bytes(r["blob"])) for r in got.values()],
        "id long, blob binary")
    again = {r["id"]: r for r in
             trim_silence(trimmed, "id", threshold=328,
                          window=win).collect()}
    for i in got:
        assert again[i]["n_frames"] == got[i]["n_frames"]
        assert again[i]["start_frame"] == 0
        assert bytes(again[i]["blob"]) == bytes(got[i]["blob"])
