"""WARC (Web ARChive, ISO 28500) reading — the web corpus's native
container, upstream of ``operators/html.html_to_text`` and the whole
curation funnel. Common Crawl, the usual 100 TB-scale text source,
ships exclusively as gzipped WARC.

Spark shape mirrors the bulk-object scan (S4, ``ingest/avro.py``):
``binaryFile`` lists objects into one input partition per file and a
single ``mapInPandas`` pass parses records — file-level parallelism,
no shuffle, payload bytes move exactly once. WARC members are
sequential within a file by design (gzip members per record), so the
file is the parallel unit, as in every production WARC pipeline.

Parser facts (the parts consumers depend on):

- a record is ``WARC/1.0|1.1 CRLF``, header lines (``Name: value``,
  no continuation-line support — obsolete even in HTTP), an empty
  line, ``Content-Length`` payload bytes, then CRLF CRLF;
- ``Content-Length`` is an UNTRUSTED field: it is bounded against the
  remaining stream before any slice, so a corrupt length raises
  ValueError instead of mis-framing every later record (the same
  stance as the Avro/MP4/MKV table guards);
- gzipped inputs (.warc.gz — one gzip member per record, the spec's
  recommended layout, or one member for the file) decompress
  transparently: Python's GzipFile consumes concatenated members;
- the HTTP response inside a ``response`` record's payload is NOT
  parsed here — ``http_payload`` splits it on demand, keeping the
  reader format-agnostic for request/metadata/warcinfo records.

Corrupt records/files follow the ST11 drop-and-count contract via
``skip_invalid`` exactly like the Avro decoders.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield records as dicts: ``headers`` (first-wins, case-insensitive
    keys lower-cased) + ``payload`` bytes. Raises ValueError on a
    malformed stream — callers choose drop-vs-raise."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except (OSError, EOFError) as e:
            raise ValueError(f"bad gzip container: {e}") from None
    pos, n = 0, len(data)
    while pos < n:
        # tolerate trailing blank lines between records
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: "
                             f"{version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            key = name.strip().decode("ascii", "replace").lower()
            headers.setdefault(
                key, value.strip().decode("utf-8", "replace"))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        # UNTRUSTED length: bound before slicing so one corrupt record
        # cannot silently mis-frame the rest of the stream
        if length < 0 or pos + length > n:
            raise ValueError(
                f"Content-Length {length} exceeds remaining stream")
        payload = data[pos:pos + length]
        pos += length
        if data[pos:pos + 4] != _CRLF * 2:
            raise ValueError("record not terminated by CRLF CRLF")
        pos += 4
        yield {"headers": headers, "payload": payload}


def http_payload(payload: bytes) -> tuple[dict[str, str], bytes]:
    """Split a ``response`` record's HTTP message into (headers, body).
    Status line is kept under the ``:status`` pseudo-key."""
    sep = payload.find(_CRLF * 2)
    if sep < 0:
        raise ValueError("no HTTP header/body separator")
    headers: dict[str, str] = {}
    lines = payload[:sep].split(_CRLF)
    headers[":status"] = lines[0].decode("ascii", "replace")
    for line in lines[1:]:
        name, sep2, value = line.partition(b":")
        if sep2:
            headers.setdefault(
                name.strip().decode("ascii", "replace").lower(),
                value.strip().decode("utf-8", "replace"))
    return headers, payload[sep + 4:]


WARC_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("record_idx", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def read_warc(spark: SparkSession, path: str,
              skip_invalid: bool = True) -> DataFrame:
    """Scan a directory of .warc / .warc.gz objects into one row per
    record. One input partition per file (binaryFile), one
    mapInPandas parse — payload bytes cross Arrow once, no shuffle.

    ``skip_invalid=True`` drops a malformed FILE (framing is
    sequential, so one bad length poisons everything after it in that
    file) and keeps its already-parsed records — the drop-and-count
    half of ST11; ``False`` re-raises for fail-fast backfills."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                try:
                    for i, rec in enumerate(parse_warc(bytes(raw))):
                        h = rec["headers"]
                        rows.append([
                            fpath, i, h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("warc-record-id"),
                            h.get("content-type"), rec["payload"]])
                except ValueError:
                    if not skip_invalid:
                        raise
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_SCHEMA.fields])

    return files.mapInPandas(run, WARC_SCHEMA)


def html_responses(warc_df: DataFrame) -> DataFrame:
    """The funnel's first filter: response records whose HTTP payload
    is HTML, split into (``path``, ``record_idx``, ``target_uri``,
    ``status``, ``html`` string) — feed straight into
    ``operators.html.html_to_text``. The HTTP split runs in the same
    Python stage as the predicate (Catalyst cannot parse HTTP), but
    it is still a per-row map: no shuffle, no driver state."""
    from pyspark.sql.functions import pandas_udf

    out = T.StructType([T.StructField("status", T.StringType()),
                        T.StructField("html", T.StringType())])

    @pandas_udf(out)
    def split(payload):
        import pandas as pd
        rows = []
        for p in payload:
            try:
                h, body = http_payload(bytes(p))
                ct = h.get("content-type", "")
                if "html" not in ct.lower():
                    rows.append((None, None))
                    continue
                rows.append((h[":status"],
                             body.decode("utf-8", "replace")))
            except ValueError:
                rows.append((None, None))
        return pd.DataFrame(rows, columns=["status", "html"])

    return (warc_df.filter(F.col("warc_type") == "response")
            .withColumn("_h", split(F.col("payload")))
            .filter(F.col("_h.html").isNotNull())
            .select("path", "record_idx", "target_uri",
                    F.col("_h.status").alias("status"),
                    F.col("_h.html").alias("html")))


# -- writer (fixtures + the archive half) -------------------------------------


def write_warc(records: list[tuple[dict[str, str], bytes]],
               gzip_members: bool = False) -> bytes:
    """Serialize (headers, payload) records; ``gzip_members=True``
    emits the spec-recommended one-gzip-member-per-record layout."""
    out = []
    for headers, payload in records:
        head = [b"WARC/1.0"]
        hdrs = dict(headers)
        hdrs["Content-Length"] = str(len(payload))
        for k, v in hdrs.items():
            head.append(k.encode("ascii") + b": "
                        + str(v).encode("utf-8"))
        rec = _CRLF.join(head) + _CRLF * 2 + payload + _CRLF * 2
        out.append(gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
