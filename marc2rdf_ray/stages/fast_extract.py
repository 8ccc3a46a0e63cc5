"""Fast HTML tokenizer backing extract_text / page_to_record.

Drop-in replacement for the stdlib-HTMLParser-based extractor in
stages/extract.py: a single-pass regex tokenizer feeding the same
``_TextAndFields`` event sink, ~2-3x faster on the hot path (HTML parse is
~2/3 of per-page extraction cost).

Conformance: the HTMLParser implementation remains the SEMANTIC REFERENCE;
tests/test_fast_extract.py differential-tests this tokenizer against it on
the full synthetic corpus and handcrafted edge cases (entities, CDATA-mode
script/style, self-closing tags, comments, attribute quoting variants).
"""

from __future__ import annotations

import re
from html import unescape

_TAG_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"          # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"  # cdata
    r"|<![^>]*>"                   # doctype / declarations
    r"|<\?[^>]*>"                  # processing instructions
    r"|</\s*([a-zA-Z][-a-zA-Z0-9:._]*)[^>]*>"   # end tag   (group 1)
    r"|<([a-zA-Z][-a-zA-Z0-9:._]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>"  # start tag (2,3,4)
    r"|<",                          # stray '<'
    re.S,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)

_RAWTEXT = {"script", "style"}


def _parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    out = []
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            out.append((name, None))
            continue
        if val[:1] in "\"'":
            val = val[1:-1]
        if "&" in val:
            val = unescape(val)
        out.append((name, val))
    return out


def tokenize(html: str, sink) -> None:
    """Feed start/end/data events to a sink with the HTMLParser interface
    (handle_starttag / handle_endtag / handle_data), convert_charrefs-style
    entity decoding, and CDATA-mode script/style handling.

    ATTR_TAGS protocol: a sink may expose ``ATTR_TAGS`` (a set of tag
    names); attribute strings of other tags are then not parsed at all
    (the sink must ignore their attrs) -- attr parsing is ~10% of tokenize
    cost and most sinks read attrs of 2-3 tag kinds."""
    pos = 0
    n = len(html)
    lower = None  # lazily-lowered copy for rawtext scanning
    attr_tags = getattr(sink, "ATTR_TAGS", None)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            if data:
                sink.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            sink.handle_data(unescape(data) if "&" in data else data)
        m = _TAG_RE.match(html, lt)
        if m is None:
            sink.handle_data("<")
            pos = lt + 1
            continue
        end_name, start_name, attr_raw, selfclose = m.group(1, 2, 3, 4)
        pos = m.end()
        if m.end() - lt == 1:  # stray '<': HTMLParser emits it as data
            sink.handle_data("<")
            continue
        if start_name is not None:
            tag = start_name.lower()
            if attr_raw.strip() and (attr_tags is None or tag in attr_tags):
                attrs = _parse_attrs(attr_raw)
            else:
                attrs = []
            sink.handle_starttag(tag, attrs)
            if selfclose:
                sink.handle_endtag(tag)
            elif tag in _RAWTEXT:
                # CDATA mode: raw content until the literal close tag
                if lower is None:
                    lower = html.lower()
                close = lower.find(f"</{tag}", pos)
                if close < 0:
                    sink.handle_data(html[pos:])
                    pos = n
                else:
                    if close > pos:
                        sink.handle_data(html[pos:close])
                    gt = html.find(">", close)
                    sink.handle_endtag(tag)
                    pos = (gt + 1) if gt >= 0 else n
        elif end_name is not None:
            sink.handle_endtag(end_name.lower())
        # comments/doctype/PI/stray '<' fall through silently


def extract_text_fast(html: bytes | str) -> str:
    from .extract import _TextAndFields

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    sink = _TextAndFields()
    tokenize(html, sink)
    return sink.text()


def parse_page_fast(html: str):
    """Tokenize into a fresh _TextAndFields sink; returns the sink."""
    from .extract import _TextAndFields

    sink = _TextAndFields()
    tokenize(html, sink)
    return sink
