"""Clean-room Matroska (MKV/WebM) demux for the video samplers.

The second real container next to ISO BMFF (`operators/mp4.py`):
EBML parsing per RFC 8794 (variable-length element IDs and sizes) and
the Matroska document structure (public spec, matroska.org) —
``Segment → Info.TimestampScale / Tracks.TrackEntry / Cluster
{Timestamp, SimpleBlock…}``. The demux resolves the first video track
(TrackType 1) into absolute ``(offset, size, start_ns)`` triples by
walking cluster headers and SimpleBlock prefixes only — frame payloads
are never copied, so samplers slice exactly the frames they decode.

Scope is the same honest shape as mp4.py: payloads decode through the
repo's container-sniffing image decoders (``V_MJPEG`` / PNG-in-MKV);
all three lacing modes (Xiph / fixed-size / EBML, RFC 9559 §10)
decode with bounds-checked size tables — corrupt tables raise rather
than mis-slice; a libav swap-in would take over at frame decode for
real-world codecs.
The muxer builds one-video-track files for fixtures: explicit cluster
grouping and per-cluster base timestamps exercise the relative-
timestamp arithmetic, and non-default TimestampScale exercises the
ns conversion.
"""

from __future__ import annotations

import struct

_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_VIDEO_TRACK_TYPE = 1


def is_mkv(data: bytes) -> bool:
    return data[:4] == b"\x1aE\xdf\xa3"


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos). EBML varint: leading-zero count of the first
    byte gives the width; element IDs keep the marker bit (they are
    compared with it), sizes strip it."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    width = 8 - first.bit_length() + 1
    if pos + width > len(data):
        raise ValueError("truncated EBML varint body")
    v = first if keep_marker else first & (0xFF >> width)
    for i in range(1, width):
        v = (v << 8) | data[pos + i]
    return v, pos + width


# elements that terminate an unknown-size Cluster: the next top-level
# sibling (another Cluster, or any other Segment-level master)
_TOP_LEVEL = {_CLUSTER, _INFO, _TRACKS, _SEGMENT, _EBML_HEADER,
              0x1C53BB6B, 0x1941A469, 0x1043A770, 0x1254C367}
#             Cues        Attachments  Chapters    Tags


def _element_header(data: bytes, pos: int) -> tuple[int, int | None, int]:
    """(element_id, size_or_None, body_start) for the single element
    at ``pos`` — ``None`` size means the all-ones 'unknown size'
    pattern. The ONE place the id/size/width arithmetic lives."""
    eid, p = _read_vint(data, pos, keep_marker=True)
    size_first = data[p] if p < len(data) else 0
    size, body = _read_vint(data, p, keep_marker=False)
    width = 8 - size_first.bit_length() + 1
    if size == (1 << (7 * width)) - 1:
        return eid, None, body
    return eid, size, body


def _elements(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the EBML element
    sequence in [start, end). Unknown-size elements (all-ones size):
    Segment extends to the enclosing scope (the spec's streaming
    form); an unknown-size CLUSTER — the live-capture shape — ends at
    the next top-level element, found by walking its children (RFC
    8794's 'element ends where a non-descendant starts' rule), so
    sibling clusters after it are NEVER swallowed; anything else
    unknown-size raises rather than guessing."""
    pos = start
    while pos < end:
        eid, size, body = _element_header(data, pos)
        if size is None:                        # unknown size
            if eid == _SEGMENT:
                yield eid, body, end
                return
            if eid != _CLUSTER:
                raise ValueError(
                    f"unknown-size EBML element 0x{eid:X} unsupported")
            cend = _cluster_end(data, body, end)
            yield eid, body, cend
            pos = cend
            continue
        if body + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns scope")
        yield eid, body, body + size
        pos = body + size


def _cluster_end(data: bytes, body: int, scope_end: int) -> int:
    """End offset of an unknown-size Cluster: walk its child elements
    (all sized — nested unknown sizes inside a cluster raise) until a
    TOP-LEVEL id appears where a child id should, or the scope ends."""
    pos = body
    while pos < scope_end:
        eid, size, cb = _element_header(data, pos)
        if eid in _TOP_LEVEL:
            return pos
        if size is None:
            raise ValueError("unknown-size element inside a Cluster")
        if cb + size > scope_end:
            raise ValueError("Cluster child overruns scope")
        pos = cb + size
    return scope_end


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


class MkvTrack:
    """Resolved video track: ``timestamp_scale`` (ns per tick),
    ``codec_id``, and ``samples`` — [(abs_offset, size, start_ticks)]
    in presentation order (sorted by timestamp, storage order as the
    tie-break)."""

    __slots__ = ("timestamp_scale", "codec_id", "samples")

    def __init__(self, timestamp_scale: int, codec_id: str,
                 samples: list[tuple[int, int, int]]) -> None:
        self.timestamp_scale = timestamp_scale
        self.codec_id = codec_id
        self.samples = samples

    def start_ms(self) -> list[int]:
        s = self.timestamp_scale
        return [(t * s) // 1_000_000 for _o, _l, t in self.samples]

    def duration_ms(self) -> int:
        """Matroska's Info.Duration is optional and float-typed, so
        the pragmatic bound is last start + the last inter-frame gap
        (one tick for a single frame) — samplers stop strictly before
        this."""
        st = self.start_ms()
        if not st:
            return 0
        gap = (st[-1] - st[-2]) if len(st) > 1 else 1
        return st[-1] + max(gap, 1)


def _lace_slices(data: bytes, b: int, e: int,
                 lace: int) -> list[tuple[int, int]]:
    """(offset, length) per laced frame in a SimpleBlock body
    ``data[b:e]`` (RFC 9559 §10: u8 frame-count-minus-1, then the
    per-mode size table, then the concatenated frames; the LAST
    frame's size is always the remainder):

    - Xiph (lace 1): each of the first n-1 sizes is a run of 0xFF
      bytes plus a final <0xFF byte, summed.
    - fixed (lace 2): no size table — the payload divides evenly.
    - EBML (lace 3): first size is an unsigned EBML vint; sizes
      2..n-1 are SIGNED vint deltas from the previous size.

    Every arithmetic result is bounds-checked so a corrupt size table
    raises instead of mis-slicing (the ST11 accounting contract all
    the media decoders share)."""
    if b >= e:
        raise ValueError("laced block with no lace count")
    n = data[b] + 1
    pos = b + 1
    sizes: list[int] = []
    if lace == 1:                                    # Xiph
        for _ in range(n - 1):
            sz = 0
            while True:
                if pos >= e:
                    raise ValueError("truncated Xiph lace sizes")
                v = data[pos]
                pos += 1
                sz += v
                if v < 255:
                    break
            sizes.append(sz)
    elif lace == 2:                                  # fixed-size
        total = e - pos
        if n < 1 or total % n:
            raise ValueError("fixed lacing: payload not divisible "
                             f"into {n} frames")
        sizes = [total // n] * (n - 1)
    else:                                            # EBML
        prev = None
        for i in range(n - 1):
            raw, npos = _read_vint(data, pos, keep_marker=False)
            if npos > e:
                raise ValueError("truncated EBML lace sizes")
            if i == 0:
                prev = raw
            else:
                width = npos - pos
                prev += raw - ((1 << (7 * width - 1)) - 1)
            if prev < 0:
                raise ValueError("negative EBML lace size")
            pos = npos
            sizes.append(prev)
    rem = (e - pos) - sum(sizes)
    if rem < 0:
        raise ValueError("lace sizes overflow the block")
    sizes.append(rem)
    out: list[tuple[int, int]] = []
    cur = pos
    for sz in sizes:
        out.append((cur, sz))
        cur += sz
    return out


def demux_video_track(data: bytes) -> MkvTrack:
    """Walk Segment → Tracks (first TrackType-1 entry) and every
    Cluster's SimpleBlocks for that track. Laced blocks (flags bits
    0x06) expand to one sample per laced frame, all carrying the
    block's timestamp — the spec gives laced frames no timestamps of
    their own (players derive spacing from the track default
    duration, which video lacing in practice never relies on)."""
    if not is_mkv(data):
        raise ValueError("not an EBML/Matroska stream")
    seg = next((elt for elt in _elements(data, 0, len(data))
                if elt[0] == _SEGMENT), None)
    if seg is None:
        raise ValueError("no Segment element")
    _, sb, se = seg

    scale = 1_000_000                      # spec default: 1 ms ticks
    video_track = None
    codec_id = ""
    samples: list[tuple[int, int, int]] = []
    for eid, b, e in _elements(data, sb, se):
        if eid == _INFO:
            for i2, b2, e2 in _elements(data, b, e):
                if i2 == _TIMESTAMP_SCALE:
                    scale = _uint(data, b2, e2)
        elif eid == _TRACKS:
            for i2, b2, e2 in _elements(data, b, e):
                if i2 != _TRACK_ENTRY or video_track is not None:
                    continue
                num = ttype = None
                cid = ""
                for i3, b3, e3 in _elements(data, b2, e2):
                    if i3 == _TRACK_NUMBER:
                        num = _uint(data, b3, e3)
                    elif i3 == _TRACK_TYPE:
                        ttype = _uint(data, b3, e3)
                    elif i3 == _CODEC_ID:
                        cid = data[b3:e3].decode("ascii", "replace")
                if ttype == _VIDEO_TRACK_TYPE and num is not None:
                    video_track, codec_id = num, cid
        elif eid == _CLUSTER:
            if video_track is None:
                raise ValueError("Cluster before a video TrackEntry")
            cluster_ts = 0
            for i2, b2, e2 in _elements(data, b, e):
                if i2 == _CLUSTER_TS:
                    cluster_ts = _uint(data, b2, e2)
                elif i2 == _SIMPLE_BLOCK:
                    tnum, p = _read_vint(data, b2, keep_marker=False)
                    if tnum != video_track:
                        continue
                    if p + 3 > e2:
                        raise ValueError("truncated SimpleBlock header")
                    (rel,) = struct.unpack(">h", data[p:p + 2])
                    flags = data[p + 2]
                    lace = (flags >> 1) & 0x03
                    if lace == 0:
                        samples.append((p + 3, e2 - (p + 3),
                                        cluster_ts + rel))
                    else:
                        for off, ln in _lace_slices(data, p + 3, e2,
                                                    lace):
                            samples.append((off, ln,
                                            cluster_ts + rel))
    if video_track is None:
        raise ValueError("no video (TrackType 1) track")
    if scale <= 0:
        raise ValueError("non-positive TimestampScale")
    # PRESENTATION order (stable sort: storage order breaks ties).
    # Block timestamps ARE presentation times in Matroska, but blocks
    # arrive in STORAGE order — a B-frame muxer interleaves them (and
    # a negative relative timestamp can reach before the previous
    # cluster), which would silently mis-map instant→frame through
    # the bisection in start_ms() consumers. Same contract as the MP4
    # demux post-ctts: sound because served payloads are
    # independently decodable.
    samples.sort(key=lambda smp: smp[2])
    return MkvTrack(scale, codec_id, samples)


# -- muxer (fixtures + the write half) ---------------------------------------


def _vint(v: int) -> bytes:
    """Size varint: shortest width whose marker-stripped range holds v
    (avoiding the all-ones 'unknown size' pattern)."""
    for width in range(1, 9):
        if v < (1 << (7 * width)) - 1:
            return (v | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("EBML size too large")


def _elt(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") \
        + _vint(len(payload)) + payload


def _uint_elt(eid: int, v: int) -> bytes:
    return _elt(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _svint(v: int) -> bytes:
    """Signed EBML vint (the EBML-lacing delta coding): shortest width
    whose bias range holds v, encoded as the biased unsigned value."""
    for width in range(1, 9):
        bias = (1 << (7 * width - 1)) - 1
        if -bias <= v <= bias and (v + bias) < (1 << (7 * width)) - 1:
            return ((v + bias) | (1 << (7 * width))).to_bytes(width,
                                                              "big")
    raise ValueError("lace delta too large")


def _lace_payload(frames: list[bytes], lacing: str) -> bytes:
    """SimpleBlock body for laced frames: count byte + size table +
    concatenated frames (the exact inverse of :func:`_lace_slices`)."""
    out = bytearray([len(frames) - 1])
    if lacing == "xiph":
        for f in frames[:-1]:
            sz = len(f)
            out += b"\xff" * (sz // 255) + bytes([sz % 255])
    elif lacing == "fixed":
        if len({len(f) for f in frames}) > 1:
            raise ValueError("fixed lacing needs equal frame sizes")
    elif lacing == "ebml":
        prev = None
        for f in frames[:-1]:
            if prev is None:
                out += _vint(len(f))
            else:
                out += _svint(len(f) - prev)
            prev = len(f)
    else:
        raise ValueError(f"unknown lacing {lacing!r}")
    for f in frames:
        out += f
    return bytes(out)


def mux_video_mkv(frames: list[bytes],
                  timestamps_ticks: list[int] | None = None,
                  timestamp_scale: int = 1_000_000,
                  codec_id: str = "V_MJPEG",
                  frames_per_cluster: int = 4,
                  lacing: str | None = None) -> bytes:
    """One-video-track Matroska file. ``timestamps_ticks`` gives each
    frame's absolute timestamp (default: frame index, 1 tick apart);
    frames group into clusters of ``frames_per_cluster`` whose base
    timestamp is the first frame's — SimpleBlocks then carry signed
    16-bit RELATIVE timestamps, exercising the same arithmetic a real
    muxer emits. With ``lacing`` ("xiph" | "fixed" | "ebml") each
    cluster's frames pack into ONE laced SimpleBlock at the cluster
    base timestamp (lacing carries no per-frame timestamps — the
    trade a real muxer makes for header compactness)."""
    if not frames:
        raise ValueError("mux needs at least one frame")
    ts = timestamps_ticks or list(range(len(frames)))
    if len(ts) != len(frames):
        raise ValueError("need one timestamp per frame")
    # non-monotone timestamps are legal (a storage-order muxer
    # emitting B-frames); the int16 relative bound below still guards
    if frames_per_cluster < 1:
        raise ValueError("frames_per_cluster must be ≥ 1")

    ebml = _elt(_EBML_HEADER,
                _elt(0x4286, b"\x01")            # EBMLVersion
                + _elt(0x42F7, b"\x01")          # EBMLReadVersion
                + _elt(0x4282, b"matroska")      # DocType
                + _elt(0x4287, b"\x04")          # DocTypeVersion
                + _elt(0x4285, b"\x02"))         # DocTypeReadVersion
    info = _elt(_INFO, _uint_elt(_TIMESTAMP_SCALE, timestamp_scale))
    tracks = _elt(_TRACKS, _elt(_TRACK_ENTRY,
                                _uint_elt(_TRACK_NUMBER, 1)
                                + _uint_elt(_TRACK_TYPE, 1)
                                + _elt(0x73C5, b"\x01")   # TrackUID
                                + _elt(_CODEC_ID,
                                       codec_id.encode("ascii"))))
    lace_flag = {None: 0x00, "xiph": 0x02, "fixed": 0x04,
                 "ebml": 0x06}[lacing]
    clusters = b""
    for c0 in range(0, len(frames), frames_per_cluster):
        base = ts[c0]
        body = _uint_elt(_CLUSTER_TS, base)
        group = frames[c0:c0 + frames_per_cluster]
        if lacing is not None:
            body += _elt(_SIMPLE_BLOCK,
                         _vint(1) + struct.pack(">h", 0)
                         + bytes([0x80 | lace_flag])
                         + _lace_payload(group, lacing))
        else:
            for i in range(c0, c0 + len(group)):
                rel = ts[i] - base
                if not -32768 <= rel <= 32767:
                    raise ValueError("relative timestamp overflows "
                                     "int16 — use smaller clusters")
                body += _elt(_SIMPLE_BLOCK,
                             _vint(1) + struct.pack(">h", rel)
                             + b"\x80" + frames[i])  # keyframe, unlaced
        clusters += _elt(_CLUSTER, body)
    return ebml + _elt(_SEGMENT, info + tracks + clusters)
