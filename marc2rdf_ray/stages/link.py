"""Mention detection + entity-link scoring against a broadcast alias
dictionary.

Ray-native redesign of the reference's BatchHarvest enrichment lookup-join
(/root/reference/lib/batch_harvest.rb:72-103: local key -> external authority
-> new triples on the record's subject).  Here the "authority" is an alias
dictionary (alias string -> candidate entities with priors) broadcast once
via ``ray.put`` and resolved inside each actor's ``__init__`` -- the
broadcast-small-side join of SURVEY.md §2.5 J1; no shuffle.

Stage shape: callable class for ``map_batches(EntityLinker, concurrency=N,
batch_size=B)`` -- the persistent-state analog of the reference's
``Net::HTTP::Persistent`` connection held per batch run (batch_harvest.rb:
18-24; SURVEY.md §2.4 T3).

Scoring is deterministic: for each alias occurrence count c and candidate
prior p, score = c * p; the argmax candidate wins (ties -> lexicographically
smallest URI).  Emitted triples: (page, DEICH.mentions, entity) plus a
DEICH.mentionScore float on nothing -- kept single-edge to stay lean.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Mapping, Sequence

import pyarrow as pa

from ..model import TRIPLES_SCHEMA
from ..vocab import DEFAULT_VOCAB

MENTIONS_PRED = DEFAULT_VOCAB.resolve("DEICH.mentions")

# alias -> sequence of (entity_uri, prior)
AliasDict = Mapping[str, Sequence[tuple[str, float]]]


def build_alias_dict() -> AliasDict:
    """Deterministic alias dictionary derived from the synthetic corpus
    pools (sources/pages.py): author display names + capitalized keywords.
    Includes ambiguous aliases (two candidates) by construction when pools
    collide.  At scale this would be loaded from a reference KB table."""
    from ..sources.pages import AUTHORS, KEYWORDS

    aliases: dict[str, list[tuple[str, float]]] = {}
    for cat_name, given, _, aid in AUTHORS:
        last = cat_name.split(",")[0]
        display = f"{given} {last}"
        uri = f"http://data.example.org/person/x{aid}"
        aliases.setdefault(display, []).append((uri, 0.9))
        # surname-only alias: ambiguous across authors sharing a surname
        aliases.setdefault(last, []).append((uri, 0.3))
    for kw in KEYWORDS:
        uri = f"http://data.example.org/subject/{kw.lower()}"
        aliases.setdefault(kw.capitalize(), []).append((uri, 0.6))
    return aliases


class EntityLinker:
    """Actor-pool stage: pages batch (url, text) -> mention triples batch.

    ``alias_ref`` may be a ``ray.ObjectRef`` (broadcast; resolved once per
    actor) or a plain dict (tests).
    """

    def __init__(self, alias_ref):
        import ray

        aliases = (
            ray.get(alias_ref)
            if isinstance(alias_ref, ray.ObjectRef)
            else alias_ref
        )
        self.aliases: AliasDict = aliases
        # one alternation, longest-first so "Jane Smith" beats "Smith"
        pats = sorted(aliases, key=len, reverse=True)
        self.pattern = re.compile(
            r"\b(" + "|".join(re.escape(a) for a in pats) + r")\b"
        )

    def link_text(self, text: str) -> list[tuple[str, float]]:
        counts = Counter(m.group(1) for m in self.pattern.finditer(text))
        best: dict[str, float] = {}
        for alias, c in counts.items():
            for uri, prior in self.aliases[alias]:
                score = c * prior
                if score > best.get(uri, 0.0):
                    best[uri] = score
        if not best:
            return []
        # deterministic: highest score, ties -> smallest URI
        ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        subj, pred, obj, kind, lang, src = [], [], [], [], [], []
        for url, text in zip(urls, texts):
            for uri, _score in self.link_text(text or ""):
                subj.append(url)
                pred.append(MENTIONS_PRED)
                obj.append(uri)
                kind.append("uri")
                lang.append(None)
                src.append(url)
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
