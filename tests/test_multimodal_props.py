"""Property-based codec tests (hypothesis): any pixel/sample buffer of
any supported shape must round-trip the PNG and WAV codecs byte-exact,
and the video container must preserve frame boundaries. Driver-less and
Spark-less: pins the pure codec layer under randomized inputs beyond
the deterministic fixtures in test_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rakam_api_collector_spark.operators import multimodal as M


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    cycle=st.booleans(),
)
def test_png_roundtrip_property(w, h, c, seed, cycle):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    out = M.png_decode(M.png_encode(px, w, h, c, filter_cycle=cycle))
    assert out == (w, h, c, px)


@settings(max_examples=60, deadline=None)
@given(
    n_frames=st.integers(0, 500),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n_frames, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n_frames * ch,
                     dtype=np.int64).astype("<i2").tobytes()
    assert M.wav_decode(M.wav_encode(s, rate, ch)) == (rate, ch, s)


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(0, 300),
    ch=st.sampled_from([1, 2]),
    in_rate=st.sampled_from([4000, 8000, 12000]),
    out_rate=st.sampled_from([4000, 8000, 12000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_resample_pcm_properties(n_frames, ch, in_rate, out_rate, seed):
    """resample_pcm (the core resample_audio uses): identity when rates
    match; otherwise ceil-length output whose every frame equals the
    source frame named by the floor map, for any length/channels."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(-32768, 32768, size=(n_frames, ch),
                          dtype=np.int64).astype("<i2")
    pcm = frames.tobytes()
    n_out, out = M.resample_pcm(pcm, ch, in_rate, out_rate)
    if in_rate == out_rate:
        assert (n_out, out) == (n_frames, pcm)       # byte-exact no-op
    else:
        assert n_out == -(-n_frames * out_rate // in_rate)
        got = np.frombuffer(out, dtype="<i2").reshape(-1, ch)
        src = (np.arange(n_out) * in_rate) // out_rate
        assert np.array_equal(got, frames[src])


@settings(max_examples=30, deadline=None)
@given(lengths=st.lists(st.integers(0, 200), max_size=12),
       seed=st.integers(0, 2**31 - 1))
def test_video_container_preserves_frames(lengths, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
              for n in lengths]
    out = list(M._iter_frames(M.pack_video(frames)))
    assert [idx for idx, _ in out] == list(range(len(frames)))
    assert [fr for _, fr in out] == frames


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([1, 3]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_uniform_images_decode_exactly(w, h, ch, seed):
    """Property: a UNIFORM image has only a DC coefficient, which the
    Annex-K table quantizes and reconstructs to within the same value
    after rounding — so uniform JPEGs of any geometry decode exactly
    (including edge-replicated padding blocks)."""
    from rakam_api_collector_spark.operators import jpeg as J

    v = seed % 256
    px = bytes([v] * (w * h * ch))
    got = J.jpeg_decode(J.jpeg_encode(px, w, h, ch, quality=90))
    assert got[:3] == (w, h, ch)
    vals = set(got[3])
    # DC quantization can move the plateau by at most 1 code value
    assert all(abs(x - v) <= 1 for x in vals), (w, h, ch, v, vals)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=8, max_value=32),
    st.integers(min_value=8, max_value=32),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_jpeg_smooth_roundtrip_bounded(w, h, seed, sub):
    """Property: low-frequency content (2-D linear ramp with random
    orientation) survives q95 encode/decode within a small absolute
    error in 4:4:4 and 4:2:0."""
    import numpy as np

    from rakam_api_collector_spark.operators import jpeg as J

    rng = np.random.default_rng(seed)
    gx, gy, off = rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(0, 255)
    yy, xx = np.mgrid[0:h, 0:w]
    plane = np.clip(off + gx * xx + gy * yy, 0, 255)
    px = np.repeat(plane[..., None], 3, axis=2).astype(np.uint8).tobytes()
    got = J.jpeg_decode(J.jpeg_encode(px, w, h, 3, quality=95,
                                      subsample=sub))
    err = np.abs(np.frombuffer(got[3], np.uint8).astype(int)
                 - np.frombuffer(px, np.uint8).astype(int))
    assert err.max() <= 6, (w, h, seed, sub, err.max())


@settings(max_examples=80, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=2,
                     max_size=300),
    law=st.sampled_from(["ulaw", "alaw"]),
    ch=st.integers(1, 2))
def test_g711_wav_roundtrip_property(samples, law, ch):
    """Any int16 stream encode→wav→decode trip: the decoded stream
    equals the companding table's expansion of the code bytes exactly,
    and the end-to-end quantization error is bounded by the top-segment
    step (1024) plus A-law's >>3 input truncation — under clipping the
    error is |x| - table_max."""
    if len(samples) % ch:
        samples = samples + [0]
    src = np.asarray(samples, dtype="<i2")
    enc = (M.ulaw_encode if law == "ulaw" else M.alaw_encode)(src.tobytes())
    rate, c2, pcm = M.wav_decode(M.wav_encode_g711(enc, 8000, ch, law))
    assert (rate, c2) == (8000, ch)
    table = M._g711_decode_tables()[0 if law == "ulaw" else 1]
    got = np.frombuffer(pcm, "<i2")
    assert np.array_equal(got, table[np.frombuffer(enc, np.uint8)])
    lim = int(np.abs(table).max())           # clip point of the law
    err = np.abs(got.astype(int)
                 - np.clip(src.astype(int), -lim, lim))
    assert err.max() <= 1032
    # decode→encode is idempotent on the code stream (A-law exactly;
    # mu-law up to the -0 → +0 canonicalization)
    re_enc = np.frombuffer(
        (M.ulaw_encode if law == "ulaw" else M.alaw_encode)(pcm),
        np.uint8)
    first = np.frombuffer(enc, np.uint8)
    if law == "alaw":
        assert np.array_equal(re_enc, first)
    else:
        fixed = np.where(first == 0x7F, 0xFF, first)
        assert np.array_equal(re_enc, fixed)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 40),
    c=st.sampled_from([1, 3]),
    q=st.sampled_from([20, 60, 90]),
    sub=st.booleans(),
    spectral_only=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_identity_property(w, h, c, q, sub,
                                            spectral_only, seed):
    """Any image, any quality, either scan script: the progressive
    stream decodes BIT-identically to the baseline stream of the same
    pixels (shared quantization; the baseline decoder is the
    oracle-verified path)."""
    from rakam_api_collector_spark.operators import jpeg as J

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    sub = sub and c == 3
    base = J.jpeg_decode(J.jpeg_encode(px, w, h, c, quality=q,
                                       subsample=sub))
    prog = J.jpeg_decode(J.jpeg_encode_progressive(
        px, w, h, c, quality=q, subsample=sub,
        spectral_only=spectral_only))
    assert prog == base


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.sampled_from([1, 2]),
    bits=st.sampled_from([32, 64]),
    ext=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_float_int16_equivalence_property(n, ch, bits, ext, seed):
    """A float encoding of any int16 stream decodes back to the exact
    int16 stream, through plain and extensible containers."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32767, 32768, size=n * ch).astype("<i2")
    f = x.astype(np.float64) / 32767.0
    rate, c2, pcm = M.wav_decode(
        M.wav_encode_float(f, 8000, ch, bits=bits, extensible=ext))
    assert (rate, c2) == (8000, ch)
    assert np.array_equal(np.frombuffer(pcm, dtype="<i2"), x)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    spc=st.integers(1, 5),
    co64=st.booleans(),
    timescale=st.sampled_from([1000, 90000, 12288]),
)
def test_mp4_mux_demux_roundtrip_property(n, seed, spc, co64, timescale):
    """Any frame sizes / durations / chunk grouping / offset width:
    the demuxed sample table recovers every frame byte-exactly with
    monotone start times summing to the stts durations."""
    from rakam_api_collector_spark.operators import mp4 as M4

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
              for ln in rng.integers(1, 200, size=n)]
    durs = [int(d) for d in rng.integers(1, 5000, size=n)]
    data = M4.mux_video_mp4(frames, durations_ticks=durs,
                            timescale=timescale, codingname=b"raw ",
                            samples_per_chunk=spc, force_co64=co64)
    track = M4.demux_video_track(data)
    assert track.timescale == timescale
    assert [data[o:o + ln] for o, ln, _s in track.samples] == frames
    starts = [s for _o, _l, s in track.samples]
    assert starts == sorted(starts) and starts[0] == 0
    assert track.duration_ticks == sum(durs)


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=400),
       seed=st.integers(0, 2**31 - 1))
def test_mp4_demux_never_crashes_on_garbage(data, seed):
    """Arbitrary bytes — including streams that START like a valid MP4
    and decay into garbage — must raise a catchable ValueError/struct
    error (the ST11 contract), never hang, loop, or throw anything
    uncatchable."""
    from rakam_api_collector_spark.operators import mp4 as M4

    rng = np.random.default_rng(seed)
    good = M4.mux_video_mp4([b"xx", b"yyy"], codingname=b"raw ")
    cut = int(rng.integers(0, len(good)))
    for blob in (data, good[:cut] + data, good[:cut]):
        try:
            M4.demux_video_track(blob)
        except (ValueError, struct.error):
            pass


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
    fpc=st.integers(1, 4),
    scale=st.sampled_from([1_000_000, 100_000, 500_000]),
)
def test_mkv_mux_demux_roundtrip_property(n, seed, fpc, scale):
    """Any frame sizes / monotone timestamps / cluster grouping /
    timestamp scale: the EBML walk recovers every frame byte-exactly
    with the original absolute tick times."""
    from rakam_api_collector_spark.operators import mkv as MK

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
              for ln in rng.integers(1, 150, size=n)]
    gaps = rng.integers(1, 5000, size=n)
    ts = [int(x) for x in np.cumsum(gaps) - gaps[0]]
    data = MK.mux_video_mkv(frames, timestamps_ticks=ts,
                            timestamp_scale=scale,
                            frames_per_cluster=fpc)
    track = MK.demux_video_track(data)
    assert [data[o:o + ln] for o, ln, _t in track.samples] == frames
    assert [t for _o, _l, t in track.samples] == ts


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=300),
       seed=st.integers(0, 2**31 - 1))
def test_mkv_demux_never_crashes_on_garbage(data, seed):
    from rakam_api_collector_spark.operators import mkv as MK

    rng = np.random.default_rng(seed)
    good = MK.mux_video_mkv([b"ab", b"cde"])
    cut = int(rng.integers(0, len(good)))
    for blob in (data, good[:cut] + data, good[:cut]):
        try:
            MK.demux_video_track(blob)
        except (ValueError, struct.error):
            pass


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 12), seed=st.integers(0, 2**31 - 1),
       spc=st.integers(1, 4), use_elst=st.booleans(),
       delay=st.integers(0, 3000), trim_frames=st.integers(0, 3))
def test_mp4_timing_model_property(n, seed, spc, use_elst, delay,
                                   trim_frames):
    """The full stts×ctts×elst timing model against a brute-force
    oracle: for ANY durations, valid composition offsets (a random
    per-file permutation of presentation slots — PTS is a
    rearrangement of DTS schedule positions, all ≥ 0), and optional
    edit list (a leading empty-edit delay and/or a media_time trim
    landing ON a presentation slot), the demuxed samples are exactly
    the non-trimmed frames in presentation order at shifted times,
    and sample_index_at_ms agrees with a linear scan at every
    half-tick probe."""
    from bisect import bisect_right

    from rakam_api_collector_spark.operators import mp4 as M4

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=int(ln),
                           dtype=np.uint8).tobytes()
              for ln in rng.integers(1, 60, size=n)]
    durs = [int(d) for d in rng.integers(1, 2000, size=n)]
    dts = np.cumsum([0] + durs[:-1])
    # a permutation of the DTS schedule = valid composition offsets
    perm = rng.permutation(n)
    pts = [int(dts[perm[i]]) for i in np.argsort(perm)] \
        if rng.integers(2) else [int(t) for t in dts]
    # frame i (decode order) presents at pts[i]
    offsets = [p - int(d) for p, d in zip(pts, dts)]

    trim_frames = min(trim_frames, n - 1)
    pres_sorted = sorted(pts)
    media_time = pres_sorted[trim_frames]    # trim lands ON a slot
    edit = [(0, media_time, 1)] if use_elst else None
    if use_elst and delay:
        edit = [(delay, -1, 1)] + edit
    blob = M4.mux_video_mp4(frames, durations_ticks=durs,
                            codingname=b"raw ", samples_per_chunk=spc,
                            composition_offsets_ticks=offsets,
                            edit_list=edit)
    track = M4.demux_video_track(blob)

    shift = (delay - media_time) if use_elst else 0
    want = sorted(((p + shift, i) for i, p in enumerate(pts)
                   if p + shift >= 0))
    assert [blob[o:o + ln] for o, ln, _s in track.samples] \
        == [frames[i] for _p, i in want]
    assert [s for _o, _l, s in track.samples] == [p for p, _i in want]

    # instant→frame parity with a brute-force scan
    starts = track.start_ms()
    for t in range(0, (max(starts) if starts else 0) + 3, 7):
        linear = -1
        for j, s in enumerate(starts):
            if s <= t:
                linear = j
        assert M4.sample_index_at_ms(starts, t) == linear
        assert bisect_right(starts, t) - 1 == linear
