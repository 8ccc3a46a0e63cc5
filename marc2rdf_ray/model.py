"""Generic field-record data model.

The reference's unit of work is a MARC record: a list of fields keyed by tag,
where control fields carry one opaque value and data fields carry indicators
plus repeated (code, value) subfields (rdfmodeler.rb:149-162, 219-230,
244-286).  We generalize: *any* semi-structured document -- a MARC record or
an extracted web page -- is lowered to this shape, and the rule engine only
ever sees this shape.

Arrow-side, a record is one row:
  ``record_id: string`` plus
  ``fields: list<struct<tag, value, ind1, ind2,
                        subfields: list<struct<code, value>>>>``
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Iterator, Optional

import pyarrow as pa

SUBFIELD_TYPE = pa.struct([("code", pa.string()), ("value", pa.string())])
FIELD_TYPE = pa.struct(
    [
        ("tag", pa.string()),
        ("value", pa.string()),
        ("ind1", pa.string()),
        ("ind2", pa.string()),
        ("subfields", pa.list_(SUBFIELD_TYPE)),
    ]
)
FIELDS_TYPE = pa.list_(FIELD_TYPE)

# The triples table: the engine's sole output record type
# (rdfmodeler.rb:5,139,145).  obj_kind in {'uri','literal','integer','float'}.
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_kind", pa.string()),
        ("lang", pa.string()),
        ("src", pa.string()),  # provenance: source record id / url
    ]
)

# input_hint shape: the Common-Crawl-style pages table.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


@dataclass
class Field:
    """One field: control (value set, no subfields) or data (subfields set)."""

    tag: str
    value: Optional[str] = None
    ind1: str = " "
    ind2: str = " "
    subfields: list[tuple[str, str]] = dc_field(default_factory=list)

    def first(self, code: str) -> Optional[str]:
        """First subfield value with this code (MARC ``field[code]``)."""
        for c, v in self.subfields:
            if c == code:
                return v
        return None

    def is_control(self) -> bool:
        return self.value is not None and not self.subfields

    def to_dict(self) -> dict:
        return {
            "tag": self.tag,
            "value": self.value,
            "ind1": self.ind1,
            "ind2": self.ind2,
            "subfields": [{"code": c, "value": v} for c, v in self.subfields],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Field":
        return cls(
            tag=d["tag"],
            value=d.get("value"),
            ind1=d.get("ind1") or " ",
            ind2=d.get("ind2") or " ",
            subfields=[(sf["code"], sf["value"]) for sf in (d.get("subfields") or [])],
        )


@dataclass
class Record:
    """An ordered bag of fields; ``record_id`` is carried for provenance."""

    fields: list[Field]
    record_id: str = ""

    def tags(self) -> list[str]:
        """Unique tags in first-appearance order (ruby-marc Record#tags)."""
        seen: dict[str, None] = {}
        for f in self.fields:
            seen.setdefault(f.tag, None)
        return list(seen)

    def find_all(self, tag: str) -> list[Field]:
        return [f for f in self.fields if f.tag == tag]

    def first_value(self, tag: str) -> Optional[str]:
        """Value of the first field with this tag (control) or None."""
        for f in self.fields:
            if f.tag == tag:
                return f.value if f.value is not None else None
        return None

    def __iter__(self) -> Iterator[Field]:
        return iter(self.fields)
