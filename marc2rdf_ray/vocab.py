"""Vocabulary table: prefix -> namespace URI, and ``PREFIX.suffix`` term
resolution.

Mirrors /root/reference/lib/vocabularies.rb:3-21,71-73 (prefixes registered as
RDF module constants at boot) and the prefix->URI data of
/root/reference/config/templates/vocabularies.json (configuration data).
``RDF.module_eval("BIBO.Document")`` in the reference becomes
``resolve("BIBO.Document")`` here.
"""

from __future__ import annotations

import hashlib
import json

# Namespace data (from the reference's vocabularies.json template -- config
# data, not code), plus the core RDF/XSD namespaces the reference gets from
# the rdf gem.
NAMESPACES: dict[str, str] = {
    "BIBO": "http://purl.org/ontology/bibo/",
    "RDFS": "http://www.w3.org/2000/01/rdf-schema#",
    "XFOAF": "http://www.foafrealm.org/xfoaf/0.1/",
    "DEICH": "http://data.deichman.no/",
    "REV": "http://purl.org/stuff/rev#",
    "DBO": "http://dbpedia.org/ontology/",
    "FABIO": "http://purl.org/spar/fabio/",
    "FRBR": "http://purl.org/vocab/frbr/core#",
    "RDA": "http://rdvocab.info/Elements/",
    "GEONAMES": "http://www.geonames.org/ontology#",
    "MO": "http://purl.org/ontology/mo/",
    "YAGO": "http://dbpedia.org/class/yago/",
    "CTAG": "http://commontag.org/ns#",
    "RADATANA": "http://def.bibsys.no/xmlns/radatana/1.0#",
    "SIOC": "http://rdfs.org/sioc/ns#",
    "ACC": "http://purl.org/NET/acc#",
    "ORG": "http://www.w3.org/ns/org#",
    "IFACE": "http://www.multimedian.nl/projects/n9c/interface#",
    "SKOS": "http://www.w3.org/2004/02/skos/core#",
    "OWL": "http://www.w3.org/2002/07/owl#",
    "FOAF": "http://xmlns.com/foaf/0.1/",
    "DC": "http://purl.org/dc/terms/",
    "LVONT": "http://lexvo.org/ontology#",
    # core namespaces (rdf gem built-ins)
    "RDF": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "XSD": "http://www.w3.org/2001/XMLSchema#",
}

RDF_TYPE = NAMESPACES["RDF"] + "type"
XSD_INTEGER = NAMESPACES["XSD"] + "integer"
XSD_FLOAT = NAMESPACES["XSD"] + "float"
OWL_SAMEAS = NAMESPACES["OWL"] + "sameAs"


class Vocabulary:
    """Resolver for ``PREFIX.suffix`` predicate/class names.

    Extra namespaces may be layered on top of the built-ins (the reference's
    user-addable vocabularies, api/vocabularies.rb).
    """

    def __init__(self, extra: dict[str, str] | None = None):
        self.namespaces = dict(NAMESPACES)
        if extra:
            self.namespaces.update({k.upper(): v for k, v in extra.items()})
        self._memo: dict[str, str] = {}

    def resolve(self, name: str) -> str:
        """``"BIBO.Document"`` -> ``"http://purl.org/ontology/bibo/Document"``.

        Raises KeyError for an unknown prefix (the reference's
        ``RDF.module_eval`` would raise NameError likewise).  Memoized --
        the rule engine resolves the same few dozen names per triple."""
        hit = self._memo.get(name)
        if hit is not None:
            return hit
        prefix, dot, suffix = name.partition(".")
        if not dot:
            raise KeyError(f"not a PREFIX.suffix name: {name!r}")
        uri = self.namespaces[prefix.upper()] + suffix
        self._memo[name] = uri
        return uri

    def content_hash(self) -> str:
        """Stable hash of the namespace table (part of the rule-set hash
        recorded in lineage manifests)."""
        blob = json.dumps(self.namespaces, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_VOCAB = Vocabulary()
