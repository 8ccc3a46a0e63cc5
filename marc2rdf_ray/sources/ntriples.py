"""N-Triples reader: the round-trip complement of the writer in
functions/ntriples.py.

The reference dumps N-Triples and RELOADS them into its triple store
(rdfmodeler.rb:314-324 writes; the isql/SPARQL-update tooling bulk-loads
the dumps back -- SURVEY.md §2.2 K5).  This source closes the same loop
for the Ray engine: ``read_ntriples`` turns ``.nt`` / ``.nt.gz`` files
(including this engine's own partitioned graph output) back into the
canonical triples table ``(subj, pred, obj, obj_kind, lang, src)``.

Scale shape: one file = one task (``read_binary_files`` keeps the bytes
in the object store); gunzip + line split + parse happen inside the task,
so the driver never sees triple rows.  Lines that do not parse are
SKIPPED and counted in a log line -- the reader mirror of the writer's
skip-invalid-statements semantics (rdfmodeler.rb:317-321); a malformed
dump degrades loudly, never fatally.

``obj_kind`` is recovered exactly as the writer emitted it: ``uri`` for
``<...>`` objects, ``integer`` / ``float`` for the two typed-literal
forms the engine writes, ``literal`` otherwise.  A datatype IRI the
engine never writes is parsed as a plain literal with the lexical form
kept and the datatype dropped + logged (the table schema has no datatype
column beyond the three kinds the writer emits).
"""

from __future__ import annotations

import gzip
import logging
import re

import pyarrow as pa

from ..vocab import XSD_FLOAT, XSD_INTEGER

logger = logging.getLogger("marc2rdf_ray.ntriples_reader")

_LINE_RE = re.compile(r"^<([^>]*)> <([^>]*)> (.+?) \.\s*$")
_LIT_RE = re.compile(
    r'^"(.*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$', re.S
)
_UNESCAPE_RE = re.compile(r'\\(["\\nrt])')
_UNESCAPE_MAP = {'"': '"', "\\": "\\", "n": "\n", "r": "\r", "t": "\t"}


def _unescape(s: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPE_MAP[m.group(1)], s)


def parse_line(line: str):
    """One NT line -> (subj, pred, obj, obj_kind, lang) or None when the
    line does not parse (blank/comment lines return None silently)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if m is None:
        return None
    subj, pred, term = m.groups()
    if term.startswith("<") and term.endswith(">"):
        return (subj, pred, term[1:-1], "uri", None)
    lm = _LIT_RE.match(term)
    if lm is None:
        return None
    raw, lang, dtype = lm.groups()
    obj = _unescape(raw)
    if dtype == XSD_INTEGER:
        return (subj, pred, obj, "integer", None)
    if dtype == XSD_FLOAT:
        return (subj, pred, obj, "float", None)
    if dtype is not None:
        # datatype the engine never writes: keep the lexical form as a
        # plain literal (schema has no datatype column); log once per task
        logger.warning(
            "read_ntriples: dropping unknown datatype <%s> (kept lexical "
            "form as plain literal)", dtype,
        )
        return (subj, pred, obj, "literal", None)
    return (subj, pred, obj, "literal", lang)


_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_kind", pa.string()),
        ("lang", pa.string()),
        ("src", pa.string()),
    ]
)


def parse_bytes(payload: bytes, path: str) -> pa.Table:
    """One file's bytes -> triples table.  Gzip is detected by MAGIC
    BYTES, not extension: Ray's ``read_binary_files`` already gunzips
    ``.gz`` paths, but direct callers may hand over raw compressed
    payloads."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    text = payload.decode("utf-8", "replace")
    subj, pred, obj, kind, lang = [], [], [], [], []
    bad = 0
    for line in text.splitlines():
        row = parse_line(line)
        if row is None:
            if line.strip() and not line.lstrip().startswith("#"):
                bad += 1
            continue
        subj.append(row[0])
        pred.append(row[1])
        obj.append(row[2])
        kind.append(row[3])
        lang.append(row[4])
    if bad:
        logger.warning(
            "read_ntriples: skipped %d unparseable lines in %s", bad, path
        )
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_kind": pa.array(kind, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "src": pa.array([path] * len(subj), pa.string()),
        }
    )


def read_ntriples(paths, *, filesystem=None):
    """Read ``.nt`` / ``.nt.gz`` file(s) (a path, dir, or list) into a
    Dataset with the engine's canonical triple columns.  One task per
    file; ``src`` carries the source file path (the provenance column the
    writer fills with the page url on the way out)."""
    import ray.data as rd

    ds = rd.read_binary_files(
        paths, include_paths=True, filesystem=filesystem
    )

    def parse(b: pa.Table) -> pa.Table:
        tabs = [
            parse_bytes(payload, path)
            for payload, path in zip(
                b["bytes"].to_pylist(), b["path"].to_pylist()
            )
        ]
        if not tabs:
            return _SCHEMA.empty_table()
        return pa.concat_tables(tabs)

    return ds.map_batches(parse, batch_format="pyarrow")
