"""MARCXML and ISO2709 binary MARC readers -> generic field records.

Source analogs of the reference's ``MARC::XMLReader`` /
``MARC::ForgivingReader`` (marc2rdf.rb:47-51, api/conversion.rb:41-46).  Used
for conformance testing against the reference's fixture corpus
(/root/reference/spec/example.normarc.xml, example.binary.normarc.mrc) and as
a compatibility source; the production source is the Parquet pages table.

The binary reader is "forgiving": malformed records are skipped, never fatal
(ForgivingReader semantics, marc2rdf.rb:50).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from ..model import Field, Record

_NS = "{http://www.loc.gov/MARC21/slim}"
# marcxchange namespace used by OAI responses (spec/test.xml)
_NS_MX = "{info:lc/xmlns/marcxchange-v1}"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_record_elem(rec_elem: ET.Element) -> Record:
    fields: list[Field] = []
    for child in rec_elem:
        name = _local(child.tag)
        if name == "controlfield":
            fields.append(
                Field(tag=child.get("tag", ""), value=child.text or "")
            )
        elif name == "datafield":
            subfields = [
                (sf.get("code", ""), sf.text or "")
                for sf in child
                if _local(sf.tag) == "subfield"
            ]
            fields.append(
                Field(
                    tag=child.get("tag", ""),
                    ind1=child.get("ind1", " ") or " ",
                    ind2=child.get("ind2", " ") or " ",
                    subfields=subfields,
                )
            )
    rec = Record(fields=fields)
    rec.record_id = rec.first_value("001") or ""
    return rec


def read_marcxml(path_or_bytes) -> Iterator[Record]:
    """Stream records from a MARCXML collection file or bytes."""
    if isinstance(path_or_bytes, bytes):
        root = ET.fromstring(path_or_bytes)
    else:
        root = ET.parse(path_or_bytes).getroot()
    for rec_elem in root.iter():
        if _local(rec_elem.tag) == "record":
            yield _parse_record_elem(rec_elem)


# -- ISO2709 binary MARC ---------------------------------------------------

_FIELD_TERM = 0x1E
_SUBFIELD_DELIM = 0x1F
_REC_TERM = 0x1D


def _parse_iso2709(raw: bytes) -> Record:
    leader = raw[:24]
    base = int(leader[12:17])
    directory = raw[24 : base - 1]
    fields: list[Field] = []
    for i in range(0, len(directory) - 11, 12):
        entry = directory[i : i + 12]
        tag = entry[:3].decode("ascii")
        length = int(entry[3:7])
        start = int(entry[7:12])
        data = raw[base + start : base + start + length]
        if data.endswith(bytes([_FIELD_TERM])):
            data = data[:-1]
        if tag < "010":
            fields.append(Field(tag=tag, value=data.decode("utf-8", "replace")))
        else:
            parts = data.split(bytes([_SUBFIELD_DELIM]))
            inds = parts[0].decode("utf-8", "replace").ljust(2)
            subfields = []
            for p in parts[1:]:
                if p:
                    txt = p.decode("utf-8", "replace")
                    subfields.append((txt[:1], txt[1:]))
            fields.append(
                Field(tag=tag, ind1=inds[0], ind2=inds[1], subfields=subfields)
            )
    rec = Record(fields=fields)
    rec.record_id = rec.first_value("001") or ""
    return rec


def read_marc_binary(path: str) -> Iterator[Record]:
    """Forgiving ISO2709 reader: bad records are skipped, not fatal."""
    with open(path, "rb") as f:
        blob = f.read()
    pos = 0
    while pos < len(blob):
        chunk = blob[pos:]
        if len(chunk) < 24:
            break
        try:
            reclen = int(chunk[:5])
        except ValueError:
            nxt = blob.find(bytes([_REC_TERM]), pos)
            if nxt < 0:
                break
            pos = nxt + 1
            continue
        raw = blob[pos : pos + reclen]
        pos += max(reclen, 1)
        try:
            yield _parse_iso2709(raw)
        except Exception:
            continue  # forgiving
