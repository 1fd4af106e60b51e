"""Clean-room ISO BMFF (MP4) demux for the video sampling operators.

Replaces the synthetic ``VID0/VID1`` stand-in with the real container:
the sample table machinery of ISO/IEC 14496-12 (public spec) — box
walk ``moov → trak → mdia → minf → stbl``, sample timing from ``stts``
runs, sizes from ``stsz``, chunk layout from ``stsc``, chunk offsets
from ``stco``/``co64`` — resolved into absolute ``(offset, size,
start)`` triples so a sampler slices exactly the frames it decodes and
never touches the rest of ``mdat`` (the property that makes video
frame-sampling cheap at 100 TB: the demux walk reads a few KB of
metadata per file regardless of payload size).

Codec scope is honest: sample payloads decode through the repo's own
image decoders (``decode_image_bytes`` sniffs PNG/JPEG), i.e. this
speaks Motion-JPEG-in-MP4 (``jpeg`` sample entries, the classic
QuickTime/ISO pairing) and the same container around PNG payloads; an
AVC/HEVC track demuxes fine but raises at frame decode, where a libav
swap-in would take over. The muxer exists for fixtures and as the
write half of the pair — one video track, explicit per-sample
durations (exercising multi-run ``stts``), configurable samples-per-
chunk (exercising multi-entry ``stsc``), and ``co64`` when offsets
need 64 bits.

Reference parity note: the reference pipeline has no media handling at
all; this module is part of the beyond-reference multimodal family
(SURVEY.md LLM-operator table, llm34/llm45 machinery).
"""

from __future__ import annotations

import struct
from bisect import bisect_right

_FTYP = b"ftyp"


def is_mp4(data: bytes) -> bool:
    """ISO BMFF sniff: first box is ``ftyp`` (size ≥ 16, 4cc at 4:8)."""
    return len(data) >= 12 and data[4:8] == _FTYP


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the box sequence in
    [start, end). Validates sizes so a truncated/corrupt stream raises
    ValueError instead of looping or over-reading."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        four = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:                     # box extends to end
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {four!r} size {size} out of bounds")
        yield four, body, pos + size
        pos += size


def _child(data: bytes, start: int, end: int, four: bytes):
    for f, b, e in _boxes(data, start, end):
        if f == four:
            return b, e
    return None


def _fullbox(data: bytes, body: int) -> tuple[int, int]:
    """(version, payload_start) of a FullBox."""
    if body + 4 > len(data):
        raise ValueError("truncated FullBox header")
    return data[body], body + 4


class Mp4Track:
    """The resolved video track: ``timescale`` (ticks/second),
    ``codingname`` (sample-entry 4cc, e.g. b'jpeg'), ``samples`` —
    ``[(abs_offset, size, start_ticks)]`` in decode order — and
    ``duration_ticks`` (sum of all stts deltas)."""

    __slots__ = ("timescale", "codingname", "samples", "duration_ticks")

    def __init__(self, timescale: int, codingname: bytes,
                 samples: list[tuple[int, int, int]],
                 duration_ticks: int) -> None:
        self.timescale = timescale
        self.codingname = codingname
        self.samples = samples
        self.duration_ticks = duration_ticks

    def start_ms(self) -> list[int]:
        """Per-sample presentation start in exact integer ms."""
        ts = self.timescale
        return [(s[2] * 1000) // ts for s in self.samples]

    def duration_ms(self) -> int:
        """Track end in exact integer ms (sampling instants stop
        strictly before this)."""
        return (self.duration_ticks * 1000) // self.timescale


def demux_video_track(data: bytes) -> Mp4Track:
    """Parse the first ``vide``-handler track's sample table.

    Walks exactly the boxes the sample table needs; unknown siblings
    are skipped by size (the spec's forward-compat rule). Raises
    ValueError on missing/inconsistent tables — the ST11 accounting
    paths catch that and route the row to skip/dead-letter."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF stream (no ftyp)")
    moov = _child(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for four, tb, te in _boxes(data, *moov):
        if four != b"trak":
            continue
        mdia = _child(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(data, *mdia, b"hdlr")
        if hdlr is None:
            continue
        _, p = _fullbox(data, hdlr[0])
        if data[p + 4:p + 8] != b"vide":
            continue
        mdhd = _child(data, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak without mdhd")
        ver, p = _fullbox(data, mdhd[0])
        timescale = struct.unpack(
            ">I", data[p + (16 if ver == 1 else 8):][:4])[0]
        if timescale <= 0:
            raise ValueError("non-positive mdhd timescale")
        minf = _child(data, *mdia, b"minf")
        stbl = minf and _child(data, *minf, b"stbl")
        if not stbl:
            raise ValueError("video trak without stbl")
        codingname, samples, dur = _sample_table(data, *stbl)
        samples, dur = _apply_edit_list(
            data, moov, (tb, te), timescale, samples, dur)
        return Mp4Track(timescale, codingname, samples, dur)
    raise ValueError("no video (vide handler) track")


def _apply_edit_list(data: bytes, moov: tuple[int, int],
                     trak: tuple[int, int], timescale: int,
                     samples: list[tuple[int, int, int]], dur: int):
    """edts/elst (ISO/IEC 14496-12 §8.6.6), the shapes real muxers
    emit: an optional leading EMPTY edit (media_time −1 — the
    presentation starts D movie-timescale ticks of black/silence
    late) followed by at most one media edit at rate 1 whose
    ``media_time`` trims the timeline start (phones/HandBrake emit
    media_time = the first ctts offset so presentation starts at 0).
    Anything richer — multiple media edits (splice lists), dwell
    (rate 0), slow/fast motion rates — honest-raises; a sampler that
    ignored it would mis-time every instant.

    Effects on the already-presentation-ordered samples: PTS' =
    PTS − media_time + delay (delay converted from MOVIE timescale,
    mvhd §8.2.2, to media ticks); samples whose shifted PTS fall
    before 0 are trimmed away (the edit excludes them from
    presentation); track duration follows the same shift."""
    edts = _child(data, *trak, b"edts")
    elst = edts and _child(data, *edts, b"elst")
    if not elst:
        return samples, dur
    ver, p = _fullbox(data, elst[0])
    (n,) = struct.unpack(">I", data[p:p + 4])
    p += 4
    width = 16 if ver == 1 else 8
    if p + (width + 4) * n > elst[1]:
        raise ValueError(f"elst claims {n} entries past its own box "
                         "end")
    entries = []
    for i in range(n):
        base = p + (width + 4) * i
        if ver == 1:
            seg_dur, media_t = struct.unpack_from(">Qq", data, base)
            rate_base = base + 16
        else:
            seg_dur, media_t = struct.unpack_from(">Ii", data, base)
            rate_base = base + 8
        rate_int, _rate_frac = struct.unpack_from(">hH", data,
                                                  rate_base)
        entries.append((seg_dur, media_t, rate_int))

    delay_movie = 0
    if entries and entries[0][1] == -1:            # leading empty edit
        delay_movie = entries[0][0]
        entries = entries[1:]
    if len(entries) > 1:
        raise ValueError("elst with multiple media edits (splice "
                         "list) unsupported")
    media_time, seg_dur = 0, 0
    if entries:
        seg_dur, media_time, rate = entries[0]
        if rate != 1:
            raise ValueError(f"elst media rate {rate} (dwell/scaled "
                             "playback) unsupported")
        if media_time < 0:
            raise ValueError("elst media_time < 0 in a media edit")

    # segment durations are in MOVIE timescale (mvhd §8.2.2)
    mvhd = _child(data, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("elst without mvhd (movie timescale unknown)")
    mver, mp = _fullbox(data, mvhd[0])
    movie_ts = struct.unpack(
        ">I", data[mp + (16 if mver == 1 else 8):][:4])[0]
    if movie_ts <= 0:
        raise ValueError("non-positive mvhd timescale")
    delay_media = (delay_movie * timescale) // movie_ts

    shift = delay_media - media_time
    shifted = [(o, ln, t + shift) for o, ln, t in samples
               if t + shift >= 0]                  # trim pre-edit rows
    # presentation duration = Σ edit segment durations; a zero
    # segment_duration means "the rest of the media" (spec), i.e. the
    # media end carried over by the shift
    if seg_dur:
        dur = delay_media + (seg_dur * timescale) // movie_ts
    else:
        dur = dur + shift
    return shifted, dur


def _sample_table(data: bytes, sb: int, se: int):
    need = {}
    for four, b, e in _boxes(data, sb, se):
        if four in (b"stsd", b"stts", b"stsc", b"stsz", b"stco",
                    b"co64", b"ctts"):
            need[four] = (b, e)
    for box in (b"stsd", b"stts", b"stsc", b"stsz"):
        if box not in need:
            raise ValueError(f"sample table missing {box!r}")
    if b"stco" not in need and b"co64" not in need:
        raise ValueError("sample table missing stco/co64")

    # ctts (composition offsets): decode order ≠ presentation order
    # (B-frames). The run table parses here (bounds first — the count
    # is an UNTRUSTED 32-bit field like stts/stsz/stco, so a corrupt
    # count raises instead of misreading sibling-box bytes) and
    # expands against n_samples after stts below; PTS = DTS + offset
    # (ISO/IEC 14496-12 §8.6.1.3 — version 0 unsigned, version 1
    # signed offsets).
    ctts_runs: list[tuple[int, int]] | None = None
    if b"ctts" in need:
        ver, p = _fullbox(data, need[b"ctts"][0])
        (n_ctts,) = struct.unpack(">I", data[p:p + 4])
        p += 4
        if p + 8 * n_ctts > need[b"ctts"][1]:
            raise ValueError(
                f"ctts claims {n_ctts} entries past its own box end")
        fmt = ">Ii" if ver == 1 else ">II"
        ctts_runs = [struct.unpack_from(fmt, data, p + 8 * i)
                     for i in range(n_ctts)]

    # stsd: the codingname of sample description 1
    _, p = _fullbox(data, need[b"stsd"][0])
    (n_desc,) = struct.unpack(">I", data[p:p + 4])
    if n_desc < 1:
        raise ValueError("empty stsd")
    codingname = data[p + 8:p + 12]

    # stsz: per-sample sizes (or one constant size). Counts are
    # UNTRUSTED 32-bit fields — validate against the stream before any
    # expansion, so a corrupt count raises ValueError instead of
    # allocating gigabytes (an OOM would evade the skip_invalid
    # accounting entirely)
    _, p = _fullbox(data, need[b"stsz"][0])
    stsz_end = need[b"stsz"][1]
    const_size, n_samples = struct.unpack(">II", data[p:p + 8])
    if const_size:
        # a plausibility budget: n_samples of const_size bytes cannot
        # exceed the stream — checked BEFORE the list expansion
        if n_samples * max(1, const_size) > len(data):
            raise ValueError(
                f"stsz claims {n_samples} samples of {const_size} "
                f"bytes in a {len(data)}-byte stream")
        sizes = [const_size] * n_samples
    else:
        if p + 8 + 4 * n_samples > stsz_end:
            raise ValueError(
                f"stsz claims {n_samples} samples past its own box "
                "end")
        sizes = list(struct.unpack_from(f">{n_samples}I", data, p + 8))

    # stts: decode-time deltas as (count, delta) runs → start ticks;
    # the run table AND the run totals validate BEFORE any expansion
    _, p = _fullbox(data, need[b"stts"][0])
    stts_end = need[b"stts"][1]
    (n_runs,) = struct.unpack(">I", data[p:p + 4])
    if p + 4 + 8 * n_runs > stts_end:
        raise ValueError(f"stts claims {n_runs} runs past its own "
                         "box end")
    runs = [struct.unpack_from(">II", data, p + 4 + 8 * i)
            for i in range(n_runs)]
    if sum(c for c, _d in runs) != n_samples:
        raise ValueError(
            f"stts covers {sum(c for c, _d in runs)} samples, "
            f"stsz has {n_samples}")
    starts: list[int] = []
    t = 0
    for cnt, delta in runs:
        for _ in range(cnt):
            starts.append(t)
            t += delta

    # apply composition offsets: starts become PRESENTATION times.
    # Run counts are untrusted — the running total is capped while
    # expanding, so a bomb count raises before allocating.
    if ctts_runs is not None:
        offs: list[int] = []
        for cnt, off in ctts_runs:
            if len(offs) + cnt > n_samples:
                raise ValueError(
                    f"ctts covers more than stsz's {n_samples} samples")
            offs.extend([off] * cnt)
        if len(offs) != n_samples:
            raise ValueError(
                f"ctts covers {len(offs)} samples, stsz has "
                f"{n_samples}")
        starts = [s + o for s, o in zip(starts, offs)]
        if starts and min(starts) < 0:
            # v1 negative offsets may pull PTS before zero when the
            # matching edit list is absent; edit lists are not
            # modeled, so honest-raise rather than mis-time
            raise ValueError("ctts yields negative presentation time "
                             "(edit lists not modeled)")

    # stco/co64: chunk offsets (count bounded by the box like the
    # other tables, so corruption raises ValueError, never expands)
    four = b"stco" if b"stco" in need else b"co64"
    width = 4 if four == b"stco" else 8
    _, p = _fullbox(data, need[four][0])
    (n_chunks,) = struct.unpack(">I", data[p:p + 4])
    if p + 4 + width * n_chunks > need[four][1]:
        raise ValueError(f"{four.decode()} claims {n_chunks} chunks "
                         "past its own box end")
    offsets = struct.unpack_from(
        f">{n_chunks}{'I' if width == 4 else 'Q'}", data, p + 4)

    # stsc: (first_chunk, samples_per_chunk, desc_idx) runs — resolve
    # each sample to (absolute offset, size, start)
    _, p = _fullbox(data, need[b"stsc"][0])
    (n_sc,) = struct.unpack(">I", data[p:p + 4])
    if p + 4 + 12 * n_sc > need[b"stsc"][1]:
        raise ValueError(f"stsc claims {n_sc} entries past its own "
                         "box end")
    sc = [struct.unpack_from(">III", data, p + 4 + 12 * i)
          for i in range(n_sc)]
    if sc and sc[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")
    samples: list[tuple[int, int, int]] = []
    si = 0
    for ci in range(len(offsets)):
        chunk_no = ci + 1
        per = 0
        for first, cnt, _desc in sc:
            if first <= chunk_no:
                per = cnt
            else:
                break
        off = offsets[ci]
        for _ in range(per):
            if si >= n_samples:
                break
            samples.append((off, sizes[si], starts[si]))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"chunk layout covers {si} samples, stsz has {n_samples}")
    end = max((o + s for o, s, _ in samples), default=0)
    if end > len(data):
        raise ValueError("sample extends past end of stream")
    # PRESENTATION order (stable sort: decode index breaks PTS ties).
    # Without ctts this is the identity; with B-frame offsets it is
    # what makes start_ms() bisectable for instant→frame mapping.
    # Reordering the byte slices is sound here because every payload
    # this demux SERVES is independently decodable (MJPEG/PNG — an
    # AVC/HEVC sample decode raises downstream); a codec with
    # inter-frame prediction would need decode-order delivery plus a
    # reorder buffer, which is the libav swap-in's job.
    samples.sort(key=lambda smp: smp[2])
    return codingname, samples, t


def sample_index_at_ms(starts_ms: list[int], t_ms: int) -> int:
    """Index of the frame PRESENTED at instant ``t_ms`` — the last
    sample whose start ≤ t (−1 before the first). Pure integer
    bisection over exact-ms starts, so an oracle recomputes it."""
    return bisect_right(starts_ms, t_ms) - 1


# -- muxer (fixtures + the write half) ---------------------------------------


def _box(four: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + four + payload


def _fbox(four: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(four, struct.pack(">B3s", version,
                                  flags.to_bytes(3, "big")) + payload)


def mux_video_mp4(frames: list[bytes],
                  durations_ticks: list[int] | None = None,
                  timescale: int = 1000,
                  codingname: bytes | None = None,
                  samples_per_chunk: int = 1,
                  force_co64: bool = False,
                  composition_offsets_ticks: list[int] | None = None,
                  edit_list: list[tuple[int, int, int]] | None = None,
                  ) -> bytes:
    """One-video-track ISO BMFF file around already-encoded frames.

    ``durations_ticks`` gives each sample's stts delta (default: 1000
    ticks each → 1 fps at the default millisecond timescale); runs of
    equal durations compress into stts entries exactly as the spec
    intends. ``codingname`` defaults by sniffing frame 0 (JPEG SOI →
    b'jpeg', PNG signature → b'png '). ``samples_per_chunk`` groups
    frames into shared chunks to exercise real stsc resolution."""
    if not frames:
        raise ValueError("mux needs at least one frame")
    durs = durations_ticks or [1000] * len(frames)
    if len(durs) != len(frames) or any(d <= 0 for d in durs):
        raise ValueError("need one positive duration per frame")
    if codingname is None:
        codingname = b"jpeg" if frames[0][:2] == b"\xff\xd8" else b"png "
    if len(codingname) != 4:
        raise ValueError("codingname must be 4 bytes")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be ≥ 1")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_body = len(ftyp) + 8                 # abs offset of frame 0

    # chunk offsets: frames grouped samples_per_chunk at a time
    sizes = [len(f) for f in frames]
    chunk_offs: list[int] = []
    pos = mdat_body
    for i, sz in enumerate(sizes):
        if i % samples_per_chunk == 0:
            chunk_offs.append(pos)
        pos += sz

    # stts runs
    runs: list[tuple[int, int]] = []
    for d in durs:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _fbox(b"stts", 0, 0, struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">II", c, d) for c, d in runs))

    # VisualSampleEntry (86 bytes): reserved/dref-index, pre-defined,
    # w/h unknown (0 — our demux never reads them), 72dpi, depth 24
    entry = (struct.pack(">I", 86) + codingname
             + b"\0" * 6 + struct.pack(">H", 1)
             + b"\0" * 16
             + struct.pack(">HH", 0, 0)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\0" * 32
             + struct.pack(">Hh", 24, -1))
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)

    stsz = _fbox(b"stsz", 0, 0, struct.pack(">II", 0, len(sizes))
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stsc = _fbox(b"stsc", 0, 0, struct.pack(">I", 1)
                 + struct.pack(">III", 1, samples_per_chunk, 1))
    if force_co64 or (chunk_offs and chunk_offs[-1] > 0xFFFFFFFF):
        stco = _fbox(b"co64", 0, 0, struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    else:
        stco = _fbox(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">I", o) for o in chunk_offs))

    # ctts (optional, run-length like stts): some muxers emit an
    # all-zero table unconditionally — the demux accepts that and
    # honest-raises on any non-zero offset (B-frame reordering)
    ctts = b""
    if composition_offsets_ticks is not None:
        if len(composition_offsets_ticks) != len(frames):
            raise ValueError("need one composition offset per frame")
        cruns: list[tuple[int, int]] = []
        for o in composition_offsets_ticks:
            if cruns and cruns[-1][1] == o:
                cruns[-1] = (cruns[-1][0] + 1, o)
            else:
                cruns.append((1, o))
        ctts = _fbox(b"ctts", 1, 0, struct.pack(">I", len(cruns))
                     + b"".join(struct.pack(">Ii", c, o)
                                for c, o in cruns))

    duration = sum(durs)
    stbl = _box(b"stbl", stsd + stts + ctts + stsc + stsz + stco)
    dref = _fbox(b"dref", 0, 0, struct.pack(">I", 1)
                 + _fbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fbox(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\0" * 12 + b"video\0")
    mdhd = _fbox(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))      # language 'und'
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fbox(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\0" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", 0, 0))
    # edts/elst (optional): v0 entries (segment_duration, media_time,
    # rate_int) — movie timescale here equals the media timescale, as
    # in any single-track file this muxer writes
    edts = b""
    if edit_list is not None:
        edts = _box(b"edts", _fbox(
            b"elst", 0, 0, struct.pack(">I", len(edit_list))
            + b"".join(struct.pack(">IihH", d, m, r, 0)
                       for d, m, r in edit_list)))
    trak = _box(b"trak", tkhd + edts + mdia)
    mvhd = _fbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\0" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                      0, 0, 0x40000000)
        + b"\0" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
