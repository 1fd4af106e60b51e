"""HTML → text extraction (operators/html.py): the trafilatura-lite
rules — skip subtrees, block newlines, entity decoding, link density —
over well-formed, malformed, and generated-from-documents inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rakam_api_collector_spark.operators.html import (_extract_one,
                                                      html_to_text)
from rakam_api_collector_spark.tables import load_table

SF = "/root/testdata/sf0.001"

PAGE = """<!DOCTYPE html><html><head>
<title> The &amp; Title </title>
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About us</a></nav>
<h1>Heading &lt;1&gt;</h1>
<p>First   paragraph with <b>inline\nbold</b> text.</p>
<div>Second block<br>with a break.</div>
<ul><li>alpha</li><li>beta</li></ul>
<noscript>enable js</noscript><template><p>ghost</p></template>
<svg><text>vector label</text></svg>
<footer><a href="/tos">Terms</a></footer>
</body></html>"""


def test_extraction_rules():
    text, title, n_links, density = _extract_one(PAGE)
    lines = text.split("\n")
    assert title == "The & Title"
    # note: the literal newline inside <b>inline\nbold</b> is source
    # formatting, not structure — it collapses to a space
    assert lines == ["Home About us", "Heading <1>",
                     "First paragraph with inline bold text.",
                     "Second block", "with a break.",
                     "alpha", "beta", "Terms"]
    assert n_links == 3
    # anchor chars: HomeAboutus (11) + Terms (5); total non-ws chars
    total = sum(len("".join(ln.split())) for ln in lines)
    assert abs(density - 16 / total) < 1e-9
    # none of the skipped subtrees leaked
    for leak in ("color: red", "not text", "enable js", "ghost",
                 "vector label"):
        assert leak not in text


def test_title_is_first_document_title_only():
    """A <title> inside a skipped NON-head subtree (inline
    <svg><title>icon</title></svg> — an accessibility label — is the
    common case) must not reach the document title, and the FIRST
    document-level title wins over later strays."""
    text, title, _n, _d = _extract_one(
        '<html><head><title>Real</title></head><body>'
        '<p>before</p><svg><title>icon</title><circle/></svg>'
        '<p>after</p><title>stray</title></body></html>')
    assert title == "Real"
    assert "icon" not in text and "stray" not in text
    # svg-title BEFORE head: still skipped, head title still captured
    _t2, title2, _n2, _d2 = _extract_one(
        '<body><svg><title>icon</title></svg></body>'
        '<head><title>Late</title></head>')
    assert title2 == "Late"
    # body-level title with no head: first one wins
    assert _extract_one('<p>x</p><title>A</title><title>B</title>')[1] \
        == "A"


def test_malformed_html_never_raises():
    for bad in ("<p>unclosed <b>bold", "</div></div>no opens",
                "<a href=>text", "<<<>>>", "", "plain no tags",
                "<script>never closed", "<p>a<p>b<p>c"):
        text, _t, _n, d = _extract_one(bad)
        assert text is not None and 0.0 <= d <= 1.0
    # an unclosed script swallows the rest (it IS script content)
    assert _extract_one("<script>x=1; <p>hi</p>")[0] == ""


def test_unclosed_title_cannot_swallow_the_document():
    """r11 ADVICE regression: an unclosed <title> inside a non-head
    skipped subtree left in_title_elem set forever, silently dropping
    every later data node. Recovery rules: (a) the enclosing subtree
    closing ends an open title; (b) a BLOCK tag inside the document
    title means the </title> was dropped — close it; (c) an INLINE
    tag inside the document title is RCDATA text, kept verbatim (the
    browser reading of '<title>Using <canvas> in 2024</title>')."""
    # (a) unclosed svg-title; subtree close must reset title state
    text, title, _n, _d = _extract_one(
        '<body><svg><title>icon</svg><p>text</p></body>')
    assert text == "text"
    assert title is None  # svg label never becomes the page title
    # (b) unclosed BODY-level title; the next BLOCK tag ends it and
    # the captured-so-far text becomes the document title (first wins)
    text2, title2, _n2, _d2 = _extract_one(
        '<body><title>oops<p>body text</p></body>')
    assert text2 == "body text" and title2 == "oops"
    # unclosed HEAD title: same rule — </head> (a skip subtree close)
    # finalizes the title and body text survives
    text3, title3, _n3, _d3 = _extract_one(
        '<head><title>Page</head><body><p>hello</p></body>')
    assert text3 == "hello" and title3 == "Page"
    # (c) RCDATA-faithful: inline markup inside a CLOSED title is
    # title text, never body text, and nothing leaks or truncates
    t5, ti5, _n5, _d5 = _extract_one(
        '<head><title>Using <canvas> in 2024</title></head>'
        '<body><p>x</p></body>')
    assert ti5 == "Using <canvas> in 2024" and t5 == "x"
    t6, ti6, _n6, _d6 = _extract_one(
        '<head><title>Use <b>bold</b> text</title></head><p>y</p>')
    assert ti6 == "Use <b>bold</b> text" and t6 == "y"
    # well-formed documents are untouched by the recovery rules
    t4, ti4, _n4, _d4 = _extract_one(
        '<head><title>Real</title></head><body><p>x</p></body>')
    assert t4 == "x" and ti4 == "Real"


def test_html_to_text_over_documents(spark):
    """Spark path: documents wrapped in a deterministic page template
    extract back to their own text (whitespace-normalized), with the
    template chrome contributing exactly the known nav/footer lines
    and link density."""
    docs = (load_table(spark, SF, "documents").limit(20)
            .select("doc_id", F.concat(
                F.lit("<html><head><title>Doc</title></head><body>"
                      "<nav><a href='/'>Home</a></nav><p>"),
                F.col("text"),
                F.lit("</p><footer><a href='/t'>Terms</a></footer>"
                      "</body></html>")).alias("page")))
    out = html_to_text(docs, "doc_id", "page").collect()
    assert len(out) == 20
    originals = {r.doc_id: r.text for r in
                 load_table(spark, SF, "documents").limit(20).collect()}
    for r in out:
        want = " ".join(originals[r.doc_id].split())
        body = r.text.split("\n")
        assert body[0] == "Home" and body[-1] == "Terms"
        assert " ".join(" ".join(body[1:-1]).split()) == want
        assert r.title == "Doc" and r.n_links == 2
        assert 0.0 < r.link_density < 1.0


def test_html_to_text_is_per_row_map(spark):
    """Plan shape: one ArrowEvalPython over the scan — no shuffle, no
    join; the 100 TB cost is a single pass."""
    docs = (load_table(spark, SF, "documents").limit(5)
            .select("doc_id", F.col("text").alias("page")))
    plan = html_to_text(docs, "doc_id", "page") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_any_text_never_raises_and_is_idempotent_on_tagless(s):
    text, _t, _n, d = _extract_one(s)
    assert 0.0 <= d <= 1.0
    if not any(c in s for c in "<>&\ue000"):
        # tagless input: extraction is whitespace normalization only
        # (U+E000 is the internal block sentinel, scrubbed to a space
        # on sight, so it is excluded from the identity claim)
        assert text == " ".join(s.split())


def test_markup_inside_title_never_swallows_the_body():
    """r12 review regression pins: a tag kept as literal title text
    must not run its element side effects — an <svg>/<a>/<script>
    reported inside the open title previously incremented
    skip/anchor/CDATA state that nothing ever unwound, dropping the
    whole body or forcing link_density to 1.0."""
    # skip-subtree tag as title text: body intact, subtree not opened
    text, title, _n, _d = _extract_one(
        '<head><title>Fun with <svg> graphics</title></head>'
        '<body><p>body text</p></body>')
    assert text == "body text"
    assert title == "Fun with <svg> graphics"
    # anchor inside title: no link counted, density stays honest
    text2, title2, n2, d2 = _extract_one(
        '<head><title>Visit <a href="/">x</a></title></head>'
        '<body><p>plain body words here</p></body>')
    assert text2 == "plain body words here"
    assert n2 == 0 and d2 == 0.0
    # script inside title: CDATA mode undone, title keeps the text,
    # the body survives
    text3, title3, _n3, _d3 = _extract_one(
        '<head><title>use <script> tags</title></head>'
        '<body><p>still here</p></body>')
    assert text3 == "still here"
    assert "use" in title3 and "tags" in title3


def test_stray_skip_end_tag_cannot_underflow_head():
    """r12 review regression pin: an unmatched </svg> must not consume
    the skip level <head> owns — head-only content (meta text, style)
    must never leak into the extracted body text."""
    text, title, _n, _d = _extract_one(
        '<head><title>My Title</title></svg><meta name=x>leak'
        '<style>x{}</style></head><body><p>hi</p></body>')
    assert text == "hi"
    assert title == "My Title"


# --- structural property fuzz -------------------------------------------

# element alphabet for the balanced-markup generator: body containers
# that KEEP text, skip subtrees that DROP it, and the anchor (kept +
# counted). script/style/title take text-only children: the parser's
# CDATA/RCDATA handling makes nested markup inside them a tokenizer
# question, not a tree question (an inner </script> ends the outer
# element early in every real browser too).
_KEEP_TAGS = ("p", "div", "b", "i", "span", "a")
_DROP_TAGS = ("svg", "template", "noscript", "head")
_TEXT_ONLY = ("script", "style", "title")


def _gen_node(draw, depth, counter):
    kind = draw(st.integers(0, 9))
    if depth >= 3 or kind < 4:                       # text leaf
        counter[0] += 1
        return f"w{counter[0]}", [f"w{counter[0]}"]
    if kind < 6:                                     # text-only elem
        tag = draw(st.sampled_from(_TEXT_ONLY))
        counter[0] += 1
        return f"<{tag}>t{counter[0]}</{tag}>", []
    tag = draw(st.sampled_from(_KEEP_TAGS + _DROP_TAGS))
    html, kept = "", []
    for _ in range(draw(st.integers(0, 3))):
        h, k = _gen_node(draw, depth + 1, counter)
        html += h + " "          # adjacent text leaves must not fuse
        kept += k
    if tag in _DROP_TAGS:
        kept = []
    return f"<{tag}>{html}</{tag}>", kept


@st.composite
def _balanced_page(draw):
    counter = [0]
    html, kept = "", []
    for _ in range(draw(st.integers(1, 5))):
        h, k = _gen_node(draw, 0, counter)
        html += h + " "
        kept += k
    return html, kept


@settings(max_examples=120, deadline=None)
@given(_balanced_page())
def test_balanced_markup_keeps_exactly_the_body_tokens(page):
    """Ground-truth structural property: for BALANCED markup, the
    extracted body text is exactly the text outside skip subtrees and
    title-family elements, in document order — no token ever lost
    (the r12 review bugs dropped whole bodies via leaked skip/CDATA
    state; this invariant would have caught both) and no skipped or
    title token ever leaks in."""
    html, kept = page
    text, _title, _n, d = _extract_one(html)
    assert text.split() == kept
    assert 0.0 <= d <= 1.0
