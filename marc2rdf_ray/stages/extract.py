"""HTML -> text and HTML -> field-record extraction.

The web-page analog of the reference's MARC parsing step: a page is lowered
to the same generic field-record shape the rule engine consumes (model.py),
the way ``MARC::XMLReader`` lowers MARCXML (marc2rdf.rb:47-48).

``extract_text`` is the per-row invariant of BASELINE.json ``input_hint``:
byte-identical output per url vs the pages table's ``text`` column (verified
by pytest).  It is deterministic, stdlib-only, and stateless.

Field layout produced by ``extract_fields`` (the "tags" of a page):

  tag          kind      content
  -----------  --------  ----------------------------------------------------
  url          control   the page url (subject-minting identifier, analog of
                         controlfield 001, rdfmodeler.rb:14-15)
  host         control   url host
  pagemeta     control   packed fixed-width control string (analog of MARC
                         008 positional semantics): [0:6] crawl date yymmdd,
                         [6] audience code, [7] format code, [8:11] language
  title        data      ind1 = '1' when a subtitle is present;
                         a=title, b=subtitle, s=site label,
                         t=full title, 3=primary author id (for combine keys)
  meta_<name>  data      one field per <meta name=...>; a=content, and for
                         author metas: a=name, q=given name, d=lifespan,
                         e=role, 3=author id
  h1|h2|h3     data      one field per heading; a=heading text
  link         data      one field per anchor; u=href, t=anchor text

All stage functions are vectorized at batch granularity (pyarrow in/out) and
stateless -- pure tasks, no actor needed (SURVEY.md §7.2).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional
from urllib.parse import urlparse

import pyarrow as pa

from ..model import FIELDS_TYPE, Field, Record

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def _collapse(s: str) -> str:
    """_WS_RE.sub(' ', s).strip(), C-speed: for ASCII strings
    ``' '.join(s.split())`` is byte-identical (Python's ASCII whitespace
    set == the regex class); non-ASCII falls back to the regex so unicode
    whitespace (e.g. NBSP from &nbsp;) keeps its exact semantics."""
    if s.isascii():
        return " ".join(s.split())
    return _WS_RE.sub(" ", s).strip()

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "tr", "table", "section", "article", "header", "footer", "nav",
    "blockquote", "pre", "hr", "title",
}
_SKIP_TAGS = {"script", "style", "noscript", "template"}


class _TextAndFields(HTMLParser):
    """Single-pass extractor: visible body text + structured fields."""

    # only these tags' attributes are ever read; the fast tokenizer skips
    # attribute parsing for everything else (ATTR_TAGS protocol)
    ATTR_TAGS = frozenset(("html", "meta", "a"))

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0
        self._in_body = False
        self._in_title = False
        self.title: str = ""
        self._title_buf: list[str] = []
        self.metas: list[tuple[str, str]] = []
        self.headings: list[tuple[str, str]] = []
        self._heading_tag: Optional[str] = None
        self._heading_buf: list[str] = []
        self.anchors: list[tuple[str, str]] = []
        self._anchor_href: Optional[str] = None
        self._anchor_buf: list[str] = []
        self.html_lang: str = ""

    # -- tag events --------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            for k, v in attrs:
                if k == "lang" and v:
                    self.html_lang = v
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "meta":
            d = dict(attrs)
            name, content = d.get("name"), d.get("content")
            if name and content is not None:
                self.metas.append((name, content))
        if tag == "body":
            self._in_body = True
        if tag == "title":
            self._in_title = True
        if tag in ("h1", "h2", "h3"):
            self._heading_tag = tag
            self._heading_buf = []
        if tag == "a":
            self._anchor_href = dict(attrs).get("href", "")
            self._anchor_buf = []
        if tag in _BLOCK_TAGS:
            self._flush_line()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            self.title = _collapse("".join(self._title_buf))
        if tag in ("h1", "h2", "h3") and self._heading_tag == tag:
            text = _collapse("".join(self._heading_buf))
            if text:
                self.headings.append((tag, text))
            self._heading_tag = None
        if tag == "a" and self._anchor_href is not None:
            text = _collapse("".join(self._anchor_buf))
            self.anchors.append((self._anchor_href, text))
            self._anchor_href = None
        if tag == "body":
            self._flush_line()
            self._in_body = False
        if tag in _BLOCK_TAGS:
            self._flush_line()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self._title_buf.append(data)
            return
        if self._heading_tag is not None:
            self._heading_buf.append(data)
        if self._anchor_href is not None:
            self._anchor_buf.append(data)
        if self._in_body:
            self._buf.append(data)

    def _flush_line(self):
        if self._buf:
            line = _collapse("".join(self._buf))
            if line:
                self.lines.append(line)
            self._buf = []

    # -- results -----------------------------------------------------------
    def text(self) -> str:
        self._flush_line()
        return "\n".join(self.lines)


def extract_text(html: bytes | str) -> str:
    """Deterministic visible-text extraction (the input_hint invariant).

    Body text only; block elements are line boundaries; runs of ASCII
    whitespace collapse to one space; blank lines dropped; entities decoded.

    Hot path uses the regex tokenizer (fast_extract.py, ~2x faster); the
    HTMLParser-based ``_TextAndFields.feed`` remains the semantic reference
    and is differential-tested against it (tests/test_fast_extract.py).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    from .fast_extract import parse_page_fused

    return parse_page_fused(html).text()


def page_to_record(url: str, html: bytes | str, warc_ts=None) -> tuple[Record, str]:
    """Lower one page to a field record; returns (record, extracted_text)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    from .fast_extract import parse_page_fused

    p = parse_page_fused(html)

    host = urlparse(url).netloc
    fields: list[Field] = [Field(tag="url", value=url), Field(tag="host", value=host)]

    metas = dict(p.metas)  # last wins for packed-control inputs
    crawl = (metas.get("crawl_date") or "")[:6].ljust(6)
    audience = (metas.get("audience") or " ")[:1]
    fmt = (metas.get("format") or " ")[:1]
    lang3 = (p.html_lang or metas.get("language") or "").ljust(3)[:3]
    fields.append(Field(tag="pagemeta", value=f"{crawl}{audience}{fmt}{lang3}"))

    # title field: "Main - Sub | Site"
    raw_title = p.title
    site = ""
    if " | " in raw_title:
        raw_title, site = raw_title.rsplit(" | ", 1)
    main, sub = raw_title, ""
    if " - " in raw_title:
        main, sub = raw_title.split(" - ", 1)
    author_ids = [c for n, c in p.metas if n == "author_id"]
    tf = [("a", main)]
    if sub:
        tf.append(("b", sub))
    if site:
        tf.append(("s", site))
    tf.append(("t", raw_title))
    if author_ids:
        tf.append(("3", author_ids[0]))
    fields.append(
        Field(tag="title", ind1="1" if sub else "0", ind2=" ", subfields=tf)
    )

    # meta fields; author metas are grouped into one field with role/id codes
    author_extra: dict[str, list[tuple[str, str]]] = {}
    for name, content in p.metas:
        if name in ("author_role", "author_id", "author_given", "author_lifespan"):
            code = {"author_role": "e", "author_id": "3",
                    "author_given": "q", "author_lifespan": "d"}[name]
            author_extra.setdefault("meta_author", []).append((code, content))
            continue
        fields.append(Field(tag=f"meta_{name}", subfields=[("a", content)]))
    # attach collected author codes to the (first) meta_author field
    if author_extra:
        for f in fields:
            if f.tag == "meta_author":
                f.subfields.extend(author_extra["meta_author"])
                break

    for tag, text in p.headings:
        fields.append(Field(tag=tag, subfields=[("a", text)]))
    for href, text in p.anchors:
        fields.append(Field(tag="link", subfields=[("u", href), ("t", text)]))

    rec = Record(fields=fields, record_id=url)
    return rec, p.text()


# -- Ray Data batch functions ---------------------------------------------

def extract_fields_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, warc_ts, lang, fields) batch.

    Drops the wide ``html`` binary column immediately (SURVEY.md §7.4: html
    inflates blocks; project right after extract).
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    fields_col = []
    for url, html in zip(urls, htmls):
        rec, _ = page_to_record(url, html)
        fields_col.append([f.to_dict() for f in rec.fields])
    cols = {
        "url": batch["url"],
        "fields": pa.array(fields_col, type=FIELDS_TYPE),
    }
    for name in ("warc_ts", "lang"):
        if name in batch.column_names:
            cols[name] = batch[name]
    return pa.table(cols)


def verify_text_batch(batch: pa.Table) -> pa.Table:
    """Recompute extract_text(html) and compare to the stored text column
    byte-for-byte; returns (url, ok) -- the input_hint invariant check."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = batch["text"].to_pylist()
    ok = [extract_text(h) == t for h, t in zip(htmls, texts)]
    return pa.table({"url": pa.array(urls), "ok": pa.array(ok)})
