"""WARC container reading (ingest/warc.py): framing, untrusted
lengths, gzip member layouts, the HTTP split, and the full
WARC → html_to_text funnel over Spark.
"""

from __future__ import annotations

import gzip
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rakam_api_collector_spark.ingest.warc import (html_responses,
                                                   http_payload,
                                                   parse_warc,
                                                   read_warc,
                                                   write_warc)
from rakam_api_collector_spark.operators.html import html_to_text


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode() + b"\r\nServer: x\r\n\r\n" + body)


def _records():
    return [
        ({"WARC-Type": "warcinfo", "Content-Type":
          "application/warc-fields"}, b"software: test\r\n"),
        ({"WARC-Type": "request", "WARC-Target-URI": "http://a/"},
         b"GET / HTTP/1.1\r\nHost: a\r\n\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "WARC-Record-ID": "<urn:uuid:1>",
          "Content-Type": "application/http; msgtype=response"},
         _http(b"<html><body><p>Alpha page</p></body></html>")),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://b/",
          "Content-Type": "application/http; msgtype=response"},
         _http(b'{"not": "html"}', ctype="application/json")),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://c/",
          "Content-Type": "application/http; msgtype=response"},
         _http(b"<html><nav><a href=/>Home</a></nav>"
               b"<p>Gamma  body</p></html>")),
    ]


@pytest.mark.parametrize("gz", ["plain", "members", "whole"])
def test_roundtrip_all_gzip_layouts(gz):
    blob = write_warc(_records(), gzip_members=(gz == "members"))
    if gz == "whole":
        blob = gzip.compress(blob)
    recs = list(parse_warc(blob))
    assert [r["headers"]["warc-type"] for r in recs] \
        == ["warcinfo", "request", "response", "response", "response"]
    assert recs[2]["headers"]["warc-target-uri"] == "http://a/"
    h, body = http_payload(recs[2]["payload"])
    assert h[":status"] == "HTTP/1.1 200 OK"
    assert h["content-type"] == "text/html"
    assert body == b"<html><body><p>Alpha page</p></body></html>"


def test_untrusted_length_and_framing_raise():
    blob = write_warc(_records()[:2])
    # corrupt the first Content-Length to overrun the stream
    i = blob.lower().index(b"content-length: ")
    j = blob.index(b"\r\n", i)
    bad = blob[:i] + b"Content-Length: 99999999" + blob[j:]
    with pytest.raises(ValueError, match="exceeds remaining"):
        list(parse_warc(bad))
    with pytest.raises(ValueError, match="not a WARC record"):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    # a record whose terminator is missing mis-frames — raise, never
    # resync silently
    good = write_warc(_records()[:1])
    with pytest.raises(ValueError, match="terminated"):
        list(parse_warc(good[:-2]))
    with pytest.raises(ValueError, match="bad gzip"):
        list(parse_warc(b"\x1f\x8b" + b"junk"))


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.booleans())
def test_any_payload_roundtrips_and_garbage_never_hangs(payload, gz):
    blob = write_warc([({"WARC-Type": "resource"}, payload)],
                      gzip_members=gz)
    (rec,) = parse_warc(blob)
    assert rec["payload"] == payload
    # arbitrary garbage after a valid record raises, never loops
    with pytest.raises(ValueError):
        list(parse_warc(blob + b"garbage trailing bytes"))


def test_read_warc_and_funnel(spark, tmp_path):
    """The end-to-end web funnel: .warc.gz files → read_warc (one row
    per record) → html_responses (HTTP split + HTML predicate) →
    html_to_text. The JSON response and non-response records fall
    out; the two HTML pages extract."""
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(write_warc(_records(),
                                             gzip_members=True))
    (d / "b.warc").write_bytes(write_warc(_records()[:3]))
    (d / "corrupt.warc").write_bytes(b"WARC/1.0\r\nbroken")

    df = read_warc(spark, str(d))
    assert df.count() == 8                      # 5 + 3, corrupt dropped
    assert df.filter(F.col("warc_type") == "response").count() == 4
    with pytest.raises(Exception, match="WARC header"):
        read_warc(spark, str(d), skip_invalid=False).count()

    pages = html_responses(df)
    got = {(r.target_uri, r.status) for r in pages.collect()}
    assert got == {("http://a/", "HTTP/1.1 200 OK"),
                   ("http://c/", "HTTP/1.1 200 OK")}
    text = {r.target_uri: r.text for r in
            html_to_text(pages, "target_uri", "html").collect()}
    assert text["http://c/"] == "Home\nGamma body"
    assert "Alpha page" in text["http://a/"]

    plan = html_responses(df)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Exchange" not in plan               # per-row maps only
