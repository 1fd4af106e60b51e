"""Matroska (EBML) demux + the video samplers over real MKV files.

The second real container next to MP4 (tests/test_mp4.py): pins the
EBML varint/element walk, cluster-relative SimpleBlock timestamps,
non-default TimestampScale conversion, sampler parity with the VID and
MP4 layouts, and corrupt/laced rejection into the ST11 accounting."""

from __future__ import annotations

import pytest

from rakam_api_collector_spark.operators import mkv as MK
from rakam_api_collector_spark.operators import mp4 as M4
from rakam_api_collector_spark.operators import multimodal as M


def _frames(n, w=3, h=2):
    return [M.png_encode(bytes((i * 7 + j) % 256
                               for j in range(w * h)), w, h, 1)
            for i in range(n)]


def test_mux_demux_roundtrip_offsets():
    frames = _frames(7)
    data = MK.mux_video_mkv(frames, frames_per_cluster=3)
    track = MK.demux_video_track(data)
    assert track.codec_id == "V_MJPEG"
    assert len(track.samples) == 7
    for fr, (off, ln, _t) in zip(frames, track.samples):
        assert data[off:off + ln] == fr          # offsets are absolute
    # default scale: 1 tick = 1 ms, timestamps 0..6
    assert track.start_ms() == list(range(7))


def test_timestamp_scale_and_cluster_relative_times():
    """Non-default TimestampScale (100 µs ticks) and multi-cluster
    grouping: absolute times reassemble from cluster base + int16
    relative, then convert to exact ms."""
    frames = _frames(5)
    ts = [0, 70, 140, 20000, 20070]              # ticks of 100 µs
    data = MK.mux_video_mkv(frames, timestamps_ticks=ts,
                            timestamp_scale=100_000,
                            frames_per_cluster=3)
    track = MK.demux_video_track(data)
    assert track.timestamp_scale == 100_000
    assert [t for _o, _l, t in track.samples] == ts
    assert track.start_ms() == [0, 7, 14, 2000, 2007]


def test_storage_order_blocks_return_in_presentation_order():
    """Matroska block timestamps are PRESENTATION times but blocks
    arrive in storage order — a B-frame muxer interleaves them. The
    demux must return samples sorted by timestamp so instant→frame
    bisection picks the frame actually shown."""
    from rakam_api_collector_spark.operators.mp4 import \
        sample_index_at_ms

    frames = _frames(4)
    data = MK.mux_video_mkv(frames, timestamps_ticks=[0, 30, 10, 20],
                            frames_per_cluster=2)
    track = MK.demux_video_track(data)
    assert track.start_ms() == [0, 10, 20, 30]   # sorted PTS
    got = [data[o:o + ln] for o, ln, _t in track.samples]
    assert got == [frames[0], frames[2], frames[3], frames[1]]
    # the frame presented at 15 ms is storage-frame 2 (PTS 10)
    i = sample_index_at_ms(track.start_ms(), 15)
    assert track.samples[i][1] == len(frames[2])


def test_sampler_parity_vid_mp4_mkv(spark):
    """The same frames through sample_video_frames give identical rows
    for all three container formats."""
    frames = _frames(9)
    df = spark.createDataFrame(
        [(1, M.pack_video(frames)), (2, M4.mux_video_mp4(frames)),
         (3, MK.mux_video_mkv(frames))],
        "vid long, blob binary")
    out = M.sample_video_frames(df, "vid", every=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(
            (r.frame_idx, r.width, r.height, r.px_sum))
    assert sorted(by_id[1]) == sorted(by_id[2]) == sorted(by_id[3])
    assert [i for i, *_ in sorted(by_id[3])] == [0, 4, 8]


def test_time_sampler_over_mkv(spark):
    """Variable inter-frame gaps: instants map by last-start-≤-t over
    the reassembled absolute timestamps."""
    frames = _frames(3)
    data = MK.mux_video_mkv(frames, timestamps_ticks=[0, 100, 500])
    df = spark.createDataFrame([(7, data)], "vid long, blob binary")
    out = sorted((r.sample_ms, r.frame_idx) for r in
                 M.sample_video_frames_by_time(
                     df, "vid", every_ms=200).collect())
    # duration bound: 500 + last gap 400 = 900 → instants 0,200,400,
    # 600, 800 → frames 0,1,1,2,2
    assert out == [(0, 0), (200, 1), (400, 1), (600, 2), (800, 2)]


@pytest.mark.parametrize("lacing", ["xiph", "fixed", "ebml"])
def test_lacing_roundtrip(lacing):
    """All three RFC 9559 lacing modes round-trip: laced SimpleBlocks
    expand to one sample per frame with byte-identical payloads. Xiph
    and EBML lace variable sizes (EBML deltas go negative); fixed
    laces equal sizes; a >255-byte frame exercises the Xiph 0xFF-run
    coding and the multi-byte EBML first-size vint."""
    if lacing == "fixed":
        frames = [bytes([i]) * 10 for i in range(6)]   # equal sizes
    else:
        # varied sizes: 300 exercises the Xiph 0xFF-run coding and a
        # multi-byte EBML first-size vint; 300→4 a negative EBML delta
        frames = [bytes([i]) * n for i, n in
                  enumerate([9, 300, 4, 17, 2, 11])]
    data = MK.mux_video_mkv(frames, frames_per_cluster=3,
                            lacing=lacing)
    track = MK.demux_video_track(data)
    assert len(track.samples) == 6
    for fr, (off, ln, _t) in zip(frames, track.samples):
        assert data[off:off + ln] == fr
    # laced frames share the block timestamp (no per-frame times)
    assert [t for _o, _l, t in track.samples] == [0, 0, 0, 3, 3, 3]


def test_laced_and_corrupt_reject(spark):
    frames = _frames(2)
    good = MK.mux_video_mkv(frames)
    # flip the SimpleBlock flags byte to EBML lacing (0x06): the PNG
    # payload now reads as a lace-size table whose sizes overflow the
    # block — bounds checks must reject, never mis-slice
    i = good.index(b"\x80" + frames[0])
    corrupt = good[:i] + b"\x86" + good[i + 1:]
    with pytest.raises(ValueError, match="lace"):
        MK.demux_video_track(corrupt)
    # a Xiph size byte turned into an unterminated 0xFF run overflows
    # the block and rejects too
    laced = MK.mux_video_mkv(frames, lacing="xiph",
                             frames_per_cluster=2)
    needle = b"\x81\x00\x00\x82\x01"   # tracknum, rel=0, flags, count
    j = laced.index(needle) + len(needle)
    bad_xiph = laced[:j] + b"\xff" + laced[j + 1:]
    with pytest.raises(ValueError):
        MK.demux_video_track(bad_xiph)
    with pytest.raises(ValueError):
        MK.demux_video_track(good[:20])          # truncated segment
    # skip_invalid drops the broken row, keeps the good one
    df = spark.createDataFrame(
        [(1, bytearray(corrupt)), (2, bytearray(good))],
        "vid long, blob binary")
    out = M.sample_video_frames(df, "vid", every=1,
                                skip_invalid=True).collect()
    assert {r.id for r in out} == {2}


def test_unknown_size_cluster_does_not_swallow_siblings():
    """Live-captured MKV commonly writes Clusters with the all-ones
    'unknown size': the demux must end that cluster at the next
    top-level element (RFC 8794's non-descendant rule) instead of
    parsing sibling clusters as its children and silently dropping
    their frames."""
    frames = _frames(6)
    good = MK.mux_video_mkv(frames, frames_per_cluster=3)  # 2 clusters
    # patch cluster 1's size varint to unknown (same 2-byte width:
    # 0x7FFF is all value-bits set)
    cid = b"\x1fC\xb6u"
    i = good.index(cid) + 4
    width = 8 - good[i].bit_length() + 1
    assert width == 2                       # fixture small enough
    patched = good[:i] + b"\x7f\xff" + good[i + 2:]
    track = MK.demux_video_track(patched)
    assert [patched[o:o + ln] for o, ln, _t in track.samples] == frames


def test_mkv_rejects_other_unknown_size_elements():
    good = MK.mux_video_mkv(_frames(2))
    i = good.index(b"\x15I\xa9f") + 4        # Info element's size
    width = 8 - good[i].bit_length() + 1
    assert width == 1
    patched = good[:i] + b"\xff" + good[i + 1:]
    with pytest.raises(ValueError, match="unknown-size"):
        MK.demux_video_track(patched)


def test_lacing_roundtrip_fuzz():
    """Property fuzz across all three lacing modes: arbitrary frame
    size lists (including empty frames, >255-byte Xiph runs, and
    multi-byte EBML deltas in both directions) round-trip
    byte-identically through mux → demux."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(sizes=st.lists(st.integers(min_value=0, max_value=700),
                          min_size=1, max_size=25),
           lacing=st.sampled_from(["xiph", "ebml"]),
           per_cluster=st.integers(min_value=1, max_value=7))
    def check(sizes, lacing, per_cluster):
        frames = [bytes([i % 251]) * n for i, n in enumerate(sizes)]
        data = MK.mux_video_mkv(frames, lacing=lacing,
                                frames_per_cluster=per_cluster)
        track = MK.demux_video_track(data)
        got = [data[o:o + ln] for o, ln, _t in track.samples]
        assert got == frames

    check()
    # fixed lacing separately (requires equal sizes)
    for sz, n, pc in ((0, 5, 2), (13, 9, 4), (300, 3, 3)):
        frames = [bytes([j]) * sz for j in range(n)]
        data = MK.mux_video_mkv(frames, lacing="fixed",
                                frames_per_cluster=pc)
        track = MK.demux_video_track(data)
        got = [data[o:o + ln] for o, ln, _t in track.samples]
        assert got == frames
