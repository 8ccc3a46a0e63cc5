"""Config-driven XML harvester enrichment (BatchHarvest's fetch surface).

The reference enriches converted records against external HTTP endpoints
described by ``harvest.json`` documents: a URL template ``prefix + local
object value + suffix``, per-remote-predicate XPath extraction with
optional regex strip, and result limits
(/root/reference/lib/batch_harvest.rb:72-103 run_harvester, 131-154
parse_xml; config/templates/harvest.json).

This module keeps the CONFIG surface and extraction semantics and
replaces the network with a keyed response table: at 100 TB you snapshot
the remote API's responses into the object store / a parquet table keyed
by request URL and broadcast or join it -- hammering an HTTP API from ten
thousand tasks (the reference throttles with batch_limit=30 + 5 s delays)
is not a distributed design.  The response table IS the network analog;
swapping in a real fetcher is a one-function change confined to the actor.

Semantics mirrored from parse_xml (batch_harvest.rb:131-147):
- XPath evaluated with the document's own namespaces merged with the
  config's ``remote.namespaces`` (default namespace exposed as ``xmlns``,
  as Nokogiri does);
- element text collected, blank results dropped;
- optional ``regex_strip`` removed from every result (gsub all);
- ``limits.max_limit`` caps results per fetch;
- datatype uri/literal dispatch matches the rule engine's relation
  subfields (uri values go through generate_uri coercion).

The reference's dummy-cover MD5 filter (batch_harvest.rb:156-175) is the
content-checksum blocklist op (stages/enrich.py:filter_content_blocklist,
O4) composed after harvesting.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Mapping, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textops import generate_uri
from ..model import TRIPLES_SCHEMA
from ..vocab import DEFAULT_VOCAB, Vocabulary


class HarvesterConfig:
    """Parsed harvest.json entry (one harvester)."""

    def __init__(self, doc: dict, vocab: Vocabulary = DEFAULT_VOCAB):
        self.id = doc.get("id", "")
        self.vocab = vocab
        url = doc.get("url") or {}
        self.url_prefix = url.get("prefix", "")
        self.url_suffix = url.get("suffix", "")
        local = doc.get("local") or {}
        self.local_predicate = vocab.resolve(local.get("predicate", ""))
        remote = doc.get("remote") or {}
        preds = remote.get("predicates") or {}
        if isinstance(preds, list):
            # sparql-protocol style: bare predicate list, no xpath -- not
            # supported offline (needs a live SPARQL endpoint); reject
            # loudly rather than silently harvesting nothing
            raise ValueError(
                "list-style (sparql) remote.predicates need a live "
                "endpoint; supply the xpath-dict form"
            )
        self.targets = []
        for pred_name, spec in preds.items():
            self.targets.append(
                {
                    "pred": vocab.resolve(pred_name),
                    "datatype": (spec or {}).get("datatype", "literal"),
                    "xpath": (spec or {}).get("xpath", ""),
                    "regex_strip": (spec or {}).get("regex_strip") or None,
                }
            )
        self.namespaces = dict(remote.get("namespaces") or {})
        limits = doc.get("limits") or {}
        self.max_limit = int(limits.get("max_limit") or 10)

    def request_url(self, value: str) -> str:
        return f"{self.url_prefix}{value}{self.url_suffix}"


def _doc_namespaces(xml_text: str) -> dict:
    """Namespace prefixes declared in the document; the DEFAULT namespace
    is exposed under ``xmlns`` (Nokogiri's convention, which harvest.json
    xpaths like ``//xmlns:isbn`` rely on -- batch_harvest.rb:137 merges
    ``xml.namespaces`` into the config's)."""
    import io

    ns = {}
    try:
        for _event, (prefix, uri) in ET.iterparse(
            io.StringIO(xml_text), events=("start-ns",)
        ):
            ns[prefix or "xmlns"] = uri
    except ET.ParseError:
        pass
    return ns


def _xpath_to_et(xpath: str) -> str:
    """Lower the harvest.json xpath subset to ElementTree syntax:
    ``//a/b`` -> ``.//a/b``; absolute single-slash roots -> ``./``."""
    if xpath.startswith("//"):
        return ".//" + xpath[2:]
    if xpath.startswith("/"):
        return "./" + xpath[1:]
    return xpath


def extract_from_xml(xml_text: str, cfg: HarvesterConfig,
                     target: dict) -> list[str]:
    """parse_xml semantics for one target: xpath -> texts, drop blanks,
    regex-strip, cap at max_limit."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    ns = _doc_namespaces(xml_text)
    ns.update(cfg.namespaces)
    try:
        nodes = root.findall(_xpath_to_et(target["xpath"]), ns)
    except (SyntaxError, KeyError):
        return []
    results = [(n.text or "").strip() for n in nodes]
    results = [r for r in results if r]
    if target["regex_strip"]:
        pat = re.compile(target["regex_strip"])
        results = [pat.sub("", r) for r in results]
    return results[: cfg.max_limit]


class Harvester:
    """Actor-pool enrichment stage: triples batch -> harvested triples.

    ``responses_ref``: broadcast mapping request-url -> XML text (the
    snapshot of the remote endpoint; ray.ObjectRef or plain dict)."""

    def __init__(self, config, responses_ref):
        import ray

        self.cfg = (
            config if isinstance(config, HarvesterConfig)
            else HarvesterConfig(config)
        )
        self.responses: Mapping[str, str] = (
            ray.get(responses_ref)
            if isinstance(responses_ref, ray.ObjectRef)
            else responses_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.equal(batch["pred"], pa.scalar(self.cfg.local_predicate))
        )
        subj, pred, obj, kind, lang, src = [], [], [], [], [], []
        for s, key in zip(b["subj"].to_pylist(), b["obj"].to_pylist()):
            xml_text = self.responses.get(self.cfg.request_url(key))
            if xml_text is None:
                continue
            for target in self.cfg.targets:
                for value in extract_from_xml(xml_text, self.cfg, target):
                    if target["datatype"] == "uri":
                        val, k = generate_uri(value, "")
                    else:
                        val, k = value, "literal"
                    subj.append(s)
                    pred.append(target["pred"])
                    obj.append(val)
                    kind.append(k)
                    lang.append(None)
                    src.append(f"harvest:{self.cfg.id}:{key}")
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


def harvest_triples(triples_ds, config: dict, responses: Mapping[str, str]):
    """triples ds -> harvested enrichment triples ds (union with the
    original for the enriched graph; run filter_content_blocklist after
    when the harvested values are content URLs -- O4)."""
    import ray

    ref = ray.put(dict(responses))
    cfg = HarvesterConfig(config) if isinstance(config, dict) else config
    return triples_ds.map_batches(
        Harvester,
        fn_constructor_args=(cfg, ref),
        batch_format="pyarrow",
        concurrency=2,
    )
