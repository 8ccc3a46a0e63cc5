"""Differential tests: fast regex tokenizer vs the stdlib-HTMLParser
reference implementation (stages/extract.py is the semantic reference)."""

import pytest

from marc2rdf_ray.sources.pages import gen_page
from marc2rdf_ray.stages.extract import _TextAndFields
from marc2rdf_ray.stages.fast_extract import parse_page_fast, parse_page_fused


def both(html: str):
    slow = _TextAndFields()
    slow.feed(html)
    fast = parse_page_fast(html)
    return slow, fast


def assert_equal(html: str):
    slow, fast = both(html)
    fused = parse_page_fused(html)
    for cand in (fast, fused):
        assert cand.text() == slow.text()
        assert cand.title == slow.title
        assert cand.metas == slow.metas
        assert cand.headings == slow.headings
        assert cand.anchors == slow.anchors
        assert cand.html_lang == slow.html_lang


class TestCorpus:
    def test_full_corpus_identical(self):
        for i in range(250):
            assert_equal(gen_page(i)["html"].decode())


EDGE_CASES = [
    # entities in text and attributes
    '<html><body><p>a &amp; b &lt;c&gt; &quot;d&quot; &#65;</p>'
    '<a href="/x?a=1&amp;b=2">l&amp;r</a></body></html>',
    # script containing markup-like content (CDATA mode)
    "<html><body><p>before</p><script>if (a < b && c > d) "
    "document.write('<p>no</p>');</script><p>after</p></body></html>",
    "<html><body><style>p > a { color: red; }</style><p>x</p></body></html>",
    # self-closing and uppercase tags
    '<HTML LANG="en"><BODY><META NAME="k" CONTENT="v"/><BR/><P>Hi</P></BODY></HTML>',
    # attribute quoting variants
    "<html><body><a href=plain>t1</a><a href='single'>t2</a>"
    '<a href="double">t3</a><a href>t4</a></body></html>',
    # comments and doctype
    "<!DOCTYPE html><html><body><!-- <p>not text</p> --><p>real</p></body></html>",
    # unterminated comment swallows the rest (HTMLParser behavior)
    "<html><body><p>seen</p><!-- open comment <p>gone</p>",
    # nested blocks / whitespace collapse
    "<html><body><div>\n  a\n  <span> b </span>\n c </div><ul><li>x</li>"
    "<li>y</li></ul></body></html>",
    # CRLF and tabs
    "<html><body><p>a\r\n\tb</p></body></html>",
    # empty body / no body
    "<html><head><title>T</title></head></html>",
    "",
    # stray angle brackets in text
    "<html><body><p>3 < 5 and 7 > 2</p></body></html>",
    # heading and anchor interplay
    '<html><body><h1>H <a href="/x">link</a> tail</h1></body></html>',
    # table content
    "<html><body><table><tr><th>a</th><td>b</td></tr></table></body></html>",
]


class TestEdgeCases:
    @pytest.mark.parametrize("html", EDGE_CASES)
    def test_edge(self, html):
        assert_equal(html)


class TestMalformed:
    @pytest.mark.parametrize("html", [
        "\xff\xfe garbage \x00<not<html",
        "<html><body><p>unclosed",
        "<<<>>><p>x</p>",
        "<html lang=>",
    ])
    def test_no_crash_and_text_matches(self, html):
        slow, fast = both(html)
        assert fast.text() == slow.text()
        assert parse_page_fused(html).text() == slow.text()
