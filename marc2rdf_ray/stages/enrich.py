"""Enrichment against a broadcast authority table (BatchHarvest analog).

The reference enriches converted records against an external HTTP/SPARQL
authority keyed on a local predicate value (ISBN): URL template ``prefix +
object + suffix``, XPath-extract remote predicates, insert new triples on
the record's subject (/root/reference/lib/batch_harvest.rb:72-103,
config/templates/harvest.json).

Ray-native shape: the authority is a TABLE (dict) broadcast once via
``ray.put``; enrichment is a stateless ``map_batches`` lookup -- the
broadcast-small-side join of SURVEY.md §2.5 J1.  No network, no retry
ladder: at 100 TB you snapshot the authority into the object store instead
of hammering an API per record (the reference's batch_limit=30 + 5 s delay
throttling, harvest.json).

Also here: the content-checksum blocklist filter (O4 analog -- the
reference drops harvested cover images whose MD5 equals a known dummy
hash, batch_harvest.rb:156-175).
"""

from __future__ import annotations

import hashlib
from typing import Mapping

import pyarrow as pa
import pyarrow.compute as pc

from ..model import TRIPLES_SCHEMA

# key value -> {pred_uri: (obj, obj_kind)}
AuthorityTable = Mapping[str, Mapping[str, tuple[str, str]]]


class Enricher:
    """Stateless stage: for triples whose pred == key_pred, look the object
    value up in the authority and emit new triples on the same subject."""

    def __init__(self, authority_ref, key_pred: str):
        import ray

        self.authority: AuthorityTable = (
            ray.get(authority_ref)
            if isinstance(authority_ref, ray.ObjectRef)
            else authority_ref
        )
        self.key_pred = key_pred

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["pred"], pa.scalar(self.key_pred)))
        subj, pred, obj, kind, lang, src = [], [], [], [], [], []
        for s, key in zip(b["subj"].to_pylist(), b["obj"].to_pylist()):
            hit = self.authority.get(key)
            if not hit:
                continue
            for p, (o, k) in hit.items():
                subj.append(s)
                pred.append(p)
                obj.append(o)
                kind.append(k)
                lang.append(None)
                src.append(f"enrich:{key}")
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "obj_kind": pa.array(kind, pa.string()),
                "lang": pa.array(lang, pa.string()),
                "src": pa.array(src, pa.string()),
            },
            schema=TRIPLES_SCHEMA,
        )


def enrich_triples(triples_ds, authority: AuthorityTable, key_pred: str):
    """triples ds -> enrichment triples ds (union with the original to get
    the enriched graph)."""
    import ray

    ref = ray.put(dict(authority))
    return triples_ds.map_batches(
        lambda b, _ref=ref: Enricher(_ref, key_pred)(b), batch_format="pyarrow"
    )


def filter_content_blocklist(ds, col: str, blocked_md5: set[str]):
    """Drop rows whose md5(col) is in the blocklist (O4: known dummy-image
    checksum filter).  Blocklist is a tiny constant -> closure capture."""
    blocked = frozenset(blocked_md5)

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        mask = pa.array(
            [
                hashlib.md5((v or "").encode() if isinstance(v, str) else (v or b"")).hexdigest()
                not in blocked
                for v in vals
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
