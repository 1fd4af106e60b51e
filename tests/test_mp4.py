"""ISO BMFF (MP4) demux + the video samplers over real containers.

The VID0/VID1 fixture container stays the oracle-checked path (llm34/
llm45); these tests pin that the REAL container (operators/mp4.py —
clean-room ISO/IEC 14496-12 sample tables) resolves identical frame
offsets and flows through the same samplers: parity between an MP4 and
a VID container holding the same frames, multi-sample chunks (stsc
runs), variable frame durations (multi-run stts → exact instant
mapping), co64 64-bit offsets, and corrupt-stream rejection routed
through the ST11 skip_invalid accounting."""

from __future__ import annotations

import struct

import pytest

from rakam_api_collector_spark.operators import mp4 as M4
from rakam_api_collector_spark.operators import multimodal as M


def _frames(n, w=3, h=2):
    return [M.png_encode(bytes((i * 7 + j) % 256
                               for j in range(w * h)), w, h, 1)
            for i in range(n)]


def test_mux_demux_roundtrip_offsets():
    frames = _frames(5)
    data = M4.mux_video_mp4(frames, durations_ticks=[500] * 5)
    track = M4.demux_video_track(data)
    assert track.codingname == b"png "
    assert len(track.samples) == 5
    for fr, (off, ln, _st) in zip(frames, track.samples):
        assert data[off:off + ln] == fr          # offsets are absolute
    assert track.start_ms() == [0, 500, 1000, 1500, 2000]
    assert track.duration_ms() == 2500


def test_multi_sample_chunks_resolve_like_single():
    """stsc with >1 samples per chunk lays frames back to back inside
    each chunk — the resolved offsets must equal the contiguous
    layout."""
    frames = _frames(7)
    a = M4.demux_video_track(M4.mux_video_mp4(frames))
    b = M4.demux_video_track(
        M4.mux_video_mp4(frames, samples_per_chunk=3))
    data_b = M4.mux_video_mp4(frames, samples_per_chunk=3)
    assert [s[1] for s in a.samples] == [s[1] for s in b.samples]
    for fr, (off, ln, _st) in zip(frames, b.samples):
        assert data_b[off:off + ln] == fr


def test_co64_offsets():
    frames = _frames(2)
    data = M4.mux_video_mp4(frames, force_co64=True)
    track = M4.demux_video_track(data)
    for fr, (off, ln, _st) in zip(frames, track.samples):
        assert data[off:off + ln] == fr


def test_variable_durations_map_instants_exactly():
    """Variable stts: frames lasting 100/400/1000 ms — the frame at
    instant t is the last start ≤ t, by integer bisection."""
    frames = _frames(3)
    data = M4.mux_video_mp4(frames, durations_ticks=[100, 400, 1000])
    track = M4.demux_video_track(data)
    starts = track.start_ms()
    assert starts == [0, 100, 500]
    assert [M4.sample_index_at_ms(starts, t)
            for t in (0, 99, 100, 499, 500, 1400)] == [0, 0, 1, 1, 2, 2]


def test_sampler_parity_mp4_vs_vid(spark):
    """The same frames through sample_video_frames give identical rows
    whether packed as VID0 or as a real MP4 — the sampler only sees
    (idx, offset, length)."""
    frames = _frames(9)
    df = spark.createDataFrame(
        [(1, M.pack_video(frames)), (2, M4.mux_video_mp4(frames))],
        "vid long, blob binary")
    out = M.sample_video_frames(df, "vid", every=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(
            (r.frame_idx, r.width, r.height, r.px_sum))
    assert sorted(by_id[1]) == sorted(by_id[2])
    assert [i for i, *_ in sorted(by_id[2])] == [0, 4, 8]


def test_time_sampler_over_mp4(spark):
    """sample_video_frames_by_time over a variable-duration MP4: one
    row per instant, indexes from the stts starts, sampling stops at
    track end."""
    frames = _frames(3)
    data = M4.mux_video_mp4(frames, durations_ticks=[100, 400, 1000])
    df = spark.createDataFrame([(7, data)], "vid long, blob binary")
    out = sorted((r.sample_ms, r.frame_idx) for r in
                 M.sample_video_frames_by_time(
                     df, "vid", every_ms=400).collect())
    # track is 1500 ms: instants 0,400,800,1200 → frames 0,1,2,2
    assert out == [(0, 0), (400, 1), (800, 2), (1200, 2)]


def test_corrupt_streams_reject_and_skip(spark):
    frames = _frames(2)
    good = M4.mux_video_mp4(frames)
    no_moov = good[:good.index(b"moov") - 4]
    with pytest.raises(ValueError, match="moov|truncated"):
        M4.demux_video_track(no_moov)
    # stsz/stts mismatch: patch the stts run's sample count 2 → 1
    i = good.index(b"stts") + 4 + 4 + 4      # 4cc, verflags, n_runs
    bad = good[:i] + struct.pack(">I", 1) + good[i + 4:]
    with pytest.raises(ValueError, match="stts covers"):
        M4.demux_video_track(bad)
    df = spark.createDataFrame(
        [(1, bytearray(no_moov)), (2, bytearray(good))],
        "vid long, blob binary")
    out = M.sample_video_frames(df, "vid", every=1,
                                skip_invalid=True).collect()
    assert {r.id for r in out} == {2}            # bad row dropped, counted


def test_jpeg_codingname_sniff():
    """A JPEG payload (SOI marker) muxes as a 'jpeg' sample entry —
    Motion-JPEG-in-MP4 — without touching our PNG fixtures."""
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 8   # SOI + stub APP0
    data = M4.mux_video_mp4([fake_jpeg])
    assert M4.demux_video_track(data).codingname == b"jpeg"


def test_corrupt_sample_counts_raise_before_allocation():
    """stsz/stts counts are untrusted 32-bit fields: a crafted huge
    count must raise ValueError immediately (routable by skip_invalid)
    rather than expanding a multi-gigabyte Python list first."""
    good = M4.mux_video_mp4(_frames(2))
    # stsz: sample_size(4) const=0, then n_samples — patch to 4B
    i = good.index(b"stsz") + 4 + 4 + 4
    huge = good[:i] + struct.pack(">I", 0xFFFFFFFF) + good[i + 4:]
    with pytest.raises(ValueError, match="claims"):
        M4.demux_video_track(huge)
    # stts run count huge while stsz stays small → mismatch, raised
    # from the unexpanded run totals
    j = good.index(b"stts") + 4 + 4 + 4
    bad = good[:j] + struct.pack(">I", 0x7FFFFFFF) + good[j + 4:]
    with pytest.raises(ValueError, match="stts covers"):
        M4.demux_video_track(bad)
    # n_runs itself corrupted: bounded by the stts box end, ValueError
    # (not struct.error, not a giant run-table expansion)
    r = good.index(b"stts") + 4 + 4
    bad2 = good[:r] + struct.pack(">I", 0x0FFFFFFF) + good[r + 4:]
    with pytest.raises(ValueError, match="past its own box"):
        M4.demux_video_track(bad2)


def test_edit_list_shapes():
    """edts/elst: the two shapes real muxers emit are honored — a
    media_time trim (phones/HandBrake: presentation starts at the
    first ctts offset) and a leading empty edit (delay) — richer
    splice/rate lists honest-raise."""
    frames = _frames(3)

    # phone shape: ctts offsets [1000,1000,1000] push PTS to
    # 1000/2000/3000; elst media_time=1000 trims the timeline back
    # so presentation starts at 0 again
    shifted = M4.demux_video_track(M4.mux_video_mp4(
        frames, composition_offsets_ticks=[1000, 1000, 1000],
        edit_list=[(3000, 1000, 1)]))
    plain = M4.demux_video_track(M4.mux_video_mp4(frames))
    assert shifted.start_ms() == plain.start_ms() == [0, 1000, 2000]
    assert shifted.duration_ms() == plain.duration_ms()

    # trim INTO the media: media_time=1000 drops the first frame's
    # presentation slot entirely
    trimmed = M4.demux_video_track(M4.mux_video_mp4(
        frames, edit_list=[(2000, 1000, 1)]))
    assert trimmed.start_ms() == [0, 1000]
    assert [s[1] for s in trimmed.samples] \
        == [len(frames[1]), len(frames[2])]

    # leading empty edit: presentation delayed by 500 ticks (movie
    # timescale == media timescale in this muxer)
    delayed = M4.demux_video_track(M4.mux_video_mp4(
        frames, edit_list=[(500, -1, 1), (3000, 0, 1)]))
    assert delayed.start_ms() == [500, 1500, 2500]
    assert delayed.duration_ms() == 3500

    # splice lists and non-unit rates honest-raise
    with pytest.raises(ValueError, match="splice"):
        M4.demux_video_track(M4.mux_video_mp4(
            frames, edit_list=[(1000, 0, 1), (1000, 2000, 1)]))
    with pytest.raises(ValueError, match="rate"):
        M4.demux_video_track(M4.mux_video_mp4(
            frames, edit_list=[(3000, 0, 2)]))
    # corrupt entry count bounded by the box end, like every table
    good = M4.mux_video_mp4(frames, edit_list=[(3000, 0, 1)])
    c = good.index(b"elst") + 4 + 4
    bad = good[:c] + struct.pack(">I", 0x0FFFFFFF) + good[c + 4:]
    with pytest.raises(ValueError, match="past its own box"):
        M4.demux_video_track(bad)


def test_ctts_composition_offsets_reorder_to_presentation():
    """ctts (B-frame composition offsets): an all-zero table demuxes
    identically to no table; non-zero offsets yield PTS = DTS +
    offset with samples returned in PRESENTATION order (sound for
    the independently-decodable payloads this demux serves), so
    instant→frame mapping picks the frame actually shown."""
    frames = _frames(3)
    plain = M4.demux_video_track(M4.mux_video_mp4(frames))
    zeroed = M4.demux_video_track(M4.mux_video_mp4(
        frames, composition_offsets_ticks=[0, 0, 0]))
    assert zeroed.samples == plain.samples
    assert zeroed.start_ms() == plain.start_ms()

    # decode order f0,f1,f2 at DTS 0/1000/2000; offsets swap the
    # last two in presentation: PTS 0/3000/1000 → f0, f2, f1
    tr = M4.demux_video_track(M4.mux_video_mp4(
        frames, composition_offsets_ticks=[0, 2000, -1000]))
    assert tr.start_ms() == [0, 1000, 3000]          # sorted PTS
    by_pts = [s[1] for s in tr.samples]              # sizes identify
    assert by_pts == [len(frames[0]), len(frames[2]), len(frames[1])]
    # the frame PRESENTED at 1.5 s is f2 (PTS 1000), not decode-f1
    i = M4.sample_index_at_ms(tr.start_ms(), 1500)
    assert tr.samples[i][1] == len(frames[2])

    # negative presentation time (edit-list territory) honest-raises
    with pytest.raises(ValueError, match="negative presentation"):
        M4.demux_video_track(M4.mux_video_mp4(
            frames, composition_offsets_ticks=[-500, 0, 0]))
    # ctts run coverage must equal stsz's sample count
    short = M4.mux_video_mp4(frames, composition_offsets_ticks=[0, 0, 0])
    r = short.index(b"ctts") + 4 + 4 + 4     # fourcc, ver/flags, count
    short = short[:r] + struct.pack(">Ii", 2, 0) + short[r + 8:]
    with pytest.raises(ValueError, match="ctts covers"):
        M4.demux_video_track(short)
    # the entry count is untrusted like stts/stsz/stco: a corrupt
    # count must raise ValueError bounded by the ctts box end, not
    # walk into sibling boxes and die in struct on a short slice
    good = M4.mux_video_mp4(frames, composition_offsets_ticks=[0, 0, 0])
    c = good.index(b"ctts") + 4 + 4          # fourcc + version/flags
    bad = good[:c] + struct.pack(">I", 0x0FFFFFFF) + good[c + 4:]
    with pytest.raises(ValueError, match="past its own box"):
        M4.demux_video_track(bad)
