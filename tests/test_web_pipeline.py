"""The complete web-corpus pipeline, end to end in ONE lazy plan per
stage family: WARC container → HTTP split → HTML extraction →
curation funnel (quality gate → cross-page dedup → training order).
Every stage is an existing tested operator; this pins that they
actually COMPOSE — schemas line up, and the funnel's verdicts are
the right ones for a corpus with chrome, duplicates, and junk.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rakam_api_collector_spark import curation as C
from rakam_api_collector_spark.ingest.warc import (html_responses,
                                                   read_warc,
                                                   write_warc)
from rakam_api_collector_spark.operators.html import html_to_text

BODY_A = ("Stochastic gradient descent updates model parameters with "
          "small noisy steps, and practitioners tune the learning rate "
          "schedule so that training converges without oscillating. " * 3)
BODY_B = ("Columnar storage lays values of one attribute contiguously "
          "so analytical scans read only the columns a query touches, "
          "which is why projection pruning matters at scale. " * 3)


def _page(body: str) -> bytes:
    html = ("<html><head><title>Post</title><style>.x{}</style></head>"
            "<body><nav><a href='/'>Home</a><a href='/b'>Blog</a></nav>"
            f"<article><p>{body}</p></article>"
            "<footer><a href='/tos'>Terms</a></footer></body></html>")
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode())


def _rec(uri: str, payload: bytes, ctype="application/http"):
    return ({"WARC-Type": "response", "WARC-Target-URI": uri,
             "Content-Type": ctype}, payload)


def test_warc_to_training_order(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    # site A page, an exact mirror of it on another host, a second
    # real page, a link-farm page, a tiny junk page, and a non-HTML
    # response — across two .warc.gz files
    farm = ("<html><body>" + "".join(
        f"<a href='/{i}'>A very long spammy navigation entry number "
        f"{i} with keywords</a>" for i in range(40))
        + "<p>thin</p></body></html>").encode()
    f1 = [_rec("http://a.com/post", _page(BODY_A)),
          _rec("http://b.com/api", b"HTTP/1.1 200 OK\r\nContent-Type: "
               b"application/json\r\n\r\n{}"),
          _rec("http://spam.com/", b"HTTP/1.1 200 OK\r\nContent-Type: "
               b"text/html\r\n\r\n" + farm)]
    f2 = [_rec("http://mirror.net/post", _page(BODY_A)),   # exact dup
          _rec("http://c.org/columnar", _page(BODY_B)),
          _rec("http://tiny.io/", b"HTTP/1.1 200 OK\r\nContent-Type: "
               b"text/html\r\n\r\n<html><p>hi</p></html>")]
    (d / "1.warc.gz").write_bytes(write_warc(f1, gzip_members=True))
    (d / "2.warc.gz").write_bytes(write_warc(f2, gzip_members=True))

    pages = html_responses(read_warc(spark, str(d)))
    docs = (html_to_text(pages, "target_uri", "html")
            .withColumn("doc_id",
                        F.xxhash64("target_uri").bitwiseAND(
                            F.lit(2 ** 62 - 1))))

    # chrome filter: the link farm dies on link density BEFORE the
    # text-quality stages ever see it
    clean = docs.filter(F.col("link_density") <= 0.5)
    assert "spam.com" not in " ".join(
        r.target_uri for r in clean.collect())

    pipe = C.CurationPipeline([
        C.gopher_filter(min_tokens=30),     # the tiny page dies here
        C.exact_dedup(),                    # the mirror dies here
        C.training_order(n_shards=2, seed=0),
    ])
    out = pipe.run(clean.select("doc_id", "text", "target_uri"))
    rows = out.collect()
    uris = sorted(r.target_uri for r in rows)
    # exactly one of {a.com, mirror.net} survives + the columnar page
    assert len(rows) == 2
    assert "http://c.org/columnar" in uris
    assert sum(u in ("http://a.com/post", "http://mirror.net/post")
               for u in uris) == 1
    # training-order columns landed (shard assignment + position)
    assert all(r.shard in (0, 1) and r.pos >= 1 for r in rows)
    # extraction preserved the article text (chrome lines dropped)
    body = {r.target_uri: r.text for r in rows}
    surviving_a = [u for u in uris if u != "http://c.org/columnar"][0]
    assert "learning rate" in body[surviving_a]
    # adjacent inline anchors render with no separator — exactly what
    # a browser shows for markup without whitespace between them
    assert body[surviving_a].split("\n")[0] == "HomeBlog"
