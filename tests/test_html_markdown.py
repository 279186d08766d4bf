"""Golden tests for the HTML→markdown parser (E1-E3) — hand-computed
expected outputs per the reference semantics (crawl/crawl.py:164-255),
plus structural checks against the reference's real crawled corpus when
present (read-only fixtures)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.html_markdown import (
    html_to_markdown,
    html_to_markdown_udf,
)

REF_HTML_DIR = "/root/reference/crawl/1/tvpl_new/html"


def test_headers_and_paragraphs():
    html = "<html><body><h1>Title  One</h1><h2> Sub  title </h2><h3>x</h3><p>Some   text\nhere</p></body></html>"
    assert html_to_markdown(html) == "# Title One\n\n## Sub title\n\n### x\n\nSome text here"


def test_lists():
    html = "<ul><li>alpha</li><li>beta  x</li></ul><ol><li>first</li><li>second</li></ol>"
    assert html_to_markdown(html) == "- alpha\n\n- beta x\n\n1. first\n\n2. second"


def test_table_ragged_br_and_dashes():
    html = (
        "<table>"
        "<tr><th>H1</th><th>H2</th><th>H3</th></tr>"
        "<tr><td>a<br>b</td><td>--dash--text</td></tr>"
        "<tr><td>long cell value</td><td>x</td><td>y</td></tr>"
        "</table>"
    )
    expected = "\n\n".join(
        [
            "| H1              | H2       | H3 |",
            "|-----------------|----------|----|",
            "| a b             | dashtext |    |",
            "| long cell value | x        | y  |",
        ]
    )
    assert html_to_markdown(html) == expected


def test_nested_p_in_table_double_emitted():
    # descendant-walk parity: the <p> inside a cell appears both in the
    # table AND as its own block (crawl.py:185-196 walks all descendants)
    html = "<table><tr><td><p>cell para</p></td></tr></table>"
    assert html_to_markdown(html) == "| cell para |\n\n|-----------|\n\ncell para"


def test_empty_and_unclosed():
    assert html_to_markdown("") == ""
    assert html_to_markdown("<p>unclosed") == "unclosed"
    assert html_to_markdown(None) is None
    # <br> inside p: get_text ignores it (no newline in cleaned text)
    assert html_to_markdown("<p>a<br>b</p>") == "ab"


def test_implicit_li_close():
    html = "<ul><li>one<li>two</ul>"
    assert html_to_markdown(html) == "- one\n\n- two"


def test_entity_refs():
    assert html_to_markdown("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_udf_matches_python(spark):
    htmls = [
        "<h1>T</h1><p>body text</p>",
        "<table><tr><th>A</th></tr><tr><td>1</td></tr></table>",
        None,
    ]
    df = spark.createDataFrame([(h,) for h in htmls], "html STRING")
    got = [r.md for r in df.select(html_to_markdown_udf("html").alias("md")).collect()]
    assert got == [html_to_markdown(h) for h in htmls]


@pytest.mark.skipif(not os.path.isdir(REF_HTML_DIR), reason="reference corpus absent")
def test_real_corpus_structural():
    import glob

    files = sorted(glob.glob(os.path.join(REF_HTML_DIR, "doc*.html")))[:5]
    assert files
    for path in files:
        with open(path, encoding="utf-8", errors="replace") as fh:
            md = html_to_markdown(fh.read())
        assert md is not None and len(md) > 0
        # no raw tags leak through
        assert "<p>" not in md and "<table" not in md
        # blocks are blank-line separated, no empty blocks
        assert all(b.strip() for b in md.split("\n\n"))


REF_GOLDEN_MD = "/root/reference/crawl/1/tvpl/test.md"
REF_GOLDEN_HTML = os.path.join(REF_HTML_DIR, "doc641.html")


@pytest.mark.skipif(
    not (os.path.isfile(REF_GOLDEN_MD) and os.path.isfile(REF_GOLDEN_HTML)),
    reason="reference golden absent",
)
def test_reference_golden_byte_for_byte():
    """SURVEY §5.2: the one human-inspected golden output of the reference
    parser (crawl/1/tvpl/test.md, produced by crawl/crawl.py:164-255 from
    doc641.html — located by its unique document code 2017/QĐ-BTC) must be
    reproduced byte-for-byte by our stdlib re-implementation."""
    with open(REF_GOLDEN_HTML, encoding="utf-8") as f:
        html = f.read()
    with open(REF_GOLDEN_MD, encoding="utf-8") as f:
        golden = f.read()
    assert html_to_markdown(html) == golden
