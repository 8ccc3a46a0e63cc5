"""marc2rdf_ray: a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the capabilities of digibib/marc2rdf
(declarative JSON-mapping field->predicate rules, conditional combines,
URI-template minting, enrichment, canonicalization), generalized from MARC
records to Common-Crawl-style web pages and re-expressed as streaming
ray.data.Dataset pipelines.  See SURVEY.md for the operator inventory.
"""

__version__ = "0.1.0"
