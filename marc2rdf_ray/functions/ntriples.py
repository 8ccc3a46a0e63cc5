"""N-Triples serialization of the triples table.

Sink analog of the reference's ``RDFModeler.write_ntriples``
(/root/reference/lib/rdfmodeler.rb:314-324): invalid statements are skipped,
never fatal.  N-Triples 1.1 (UTF-8 literals, standard escapes).

Vectorization note: formatting is plain string work over batch columns; at
scale it runs inside ``map_batches`` tasks right before the partitioned
write, so the driver never sees triple rows.
"""

from __future__ import annotations

import re
from typing import Optional

from ..vocab import XSD_FLOAT, XSD_INTEGER

# N-Triples IRIREF production: no control chars, space, or <>"{}|^`\ inside
# <...>.  Statements with an invalid IRI term are SKIPPED, mirroring the
# reference's writer which rescues+logs invalid statements
# (rdfmodeler.rb:317-321) rather than emitting broken lines.
_INVALID_IRI_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def valid_iri(value: str) -> bool:
    return bool(value) and _INVALID_IRI_RE.search(value) is None


_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
_ESCAPE_TABLE = {ord(k): v for k, v in _ESCAPES.items()}


def escape_literal(s: str) -> str:
    return s.translate(_ESCAPE_TABLE)


def format_term(
    value: str, kind: str, lang: Optional[str] = None
) -> Optional[str]:
    """One object term: URI, plain/lang-tagged literal, or typed literal.
    Returns None for an invalid IRI (statement gets skipped upstream)."""
    if kind == "uri":
        if not valid_iri(value):
            return None
        return f"<{value}>"
    if kind == "integer":
        return f'"{escape_literal(value)}"^^<{XSD_INTEGER}>'
    if kind == "float":
        return f'"{escape_literal(value)}"^^<{XSD_FLOAT}>'
    if lang:
        return f'"{escape_literal(value)}"@{lang}'
    return f'"{escape_literal(value)}"'


def format_triple(
    subj: str, pred: str, obj: str, obj_kind: str, lang: Optional[str] = None
) -> Optional[str]:
    """One N-Triples line, or None when the statement is invalid
    (write_ntriples skips such statements, rdfmodeler.rb:317-321)."""
    if obj is None or not valid_iri(subj) or not valid_iri(pred):
        return None
    term = format_term(obj, obj_kind, lang)
    if term is None:
        return None
    return f"<{subj}> <{pred}> {term} ."


def format_batch(
    subj: list, pred: list, obj: list, obj_kind: list, lang: list
) -> list[str]:
    """Format columns into NT lines, dropping invalid rows."""
    out = []
    for s, p, o, k, l in zip(subj, pred, obj, obj_kind, lang):
        line = format_triple(s, p, o, k, l)
        if line is not None:
            out.append(line)
    return out
