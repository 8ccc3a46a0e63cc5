"""Reverse conversion round-trip + incremental window source tests."""

import datetime as dt
import os

import pyarrow.parquet as pq
import pytest

from marc2rdf_ray.config import PipelineConfig
from marc2rdf_ray.model import Field, Record
from marc2rdf_ray.rules import RuleEngine, RuleSet
from marc2rdf_ray.stages.reverse import compose_record, invert_mapping
from marc2rdf_ray.vocab import DEFAULT_VOCAB


class TestReverse:
    MAPPING = {
        "tags": {
            "245": {"subfield": {
                "a": {"predicate": "DC.title", "object": {"datatype": "literal"}},
                "b": {"predicate": "FABIO.hasSubtitle",
                      "object": {"datatype": "literal"}},
            }},
            "020": {"subfield": {
                "a": {"predicate": "BIBO.isbn", "object": {"datatype": "literal"}},
            }},
            "001": {"id": {"predicate": "DC.identifier",
                           "object": {"datatype": "literal"}}},
        }
    }

    def test_invert_mapping(self):
        inv = invert_mapping(self.MAPPING, DEFAULT_VOCAB)
        assert inv["http://purl.org/dc/terms/title"] == ("245", "a")
        assert inv["http://purl.org/dc/terms/identifier"] == ("001", None)

    def test_round_trip(self):
        """convert -> reverse recovers the mapped values (marcmodeler_spec
        round-trip analog, spec/marcmodeler_spec.rb:44-84)."""
        eng = RuleEngine(
            RuleSet(self.MAPPING), base="http://x/", prefix="r_",
            identifier_tag="001", resource_type=None,
        )
        rec = Record(fields=[
            Field(tag="001", value="42"),
            Field(tag="245", subfields=[("a", "A Title"), ("b", "A Sub")]),
            Field(tag="020", subfields=[("a", "12345")]),
        ])
        triples = eng.convert(rec)
        inv = invert_mapping(self.MAPPING, DEFAULT_VOCAB)
        fields = compose_record(
            "http://x/r_42",
            [t[1] for t in triples],
            [t[2] for t in triples],
            inv,
        )
        by_tag = {}
        for f in fields:
            by_tag.setdefault(f["tag"], []).append(f)
        assert by_tag["001"][0]["value"] == "42"
        sf245 = {s["code"]: s["value"] for s in by_tag["245"][0]["subfields"]}
        assert sf245 == {"a": "A Title", "b": "A Sub"}
        assert by_tag["020"][0]["subfields"][0]["value"] == "12345"

    def test_distinct_values_per_property(self):
        inv = {"p": ("100", "a")}
        fields = compose_record("s", ["p", "p", "p"], ["v1", "v1", "v2"], inv)
        assert len(fields) == 2  # duplicates collapsed, v1 and v2 kept

    def test_records_from_edges_ray(self, ray_session):
        import ray.data as rd

        from marc2rdf_ray.stages.reverse import records_from_edges

        edges = rd.from_items([
            {"subj": "s1", "pred": "http://purl.org/dc/terms/title", "obj": "T1"},
            {"subj": "s1", "pred": "http://purl.org/ontology/bibo/isbn", "obj": "99"},
            {"subj": "s2", "pred": "http://purl.org/dc/terms/title", "obj": "T2"},
        ])
        inv = invert_mapping(self.MAPPING, DEFAULT_VOCAB)
        out = records_from_edges(edges, inv).to_pandas()
        assert len(out) == 2
        s1 = out[out.subj == "s1"].iloc[0]["fields"]
        tags = {f["tag"] for f in s1}
        assert tags == {"245", "020"}


class TestIncrementalWindow:
    def test_window_filters_rows(self, ray_session, tmp_path):
        from marc2rdf_ray.sources.incremental import (
            daily_window,
            read_pages_window,
        )
        from marc2rdf_ray.sources.pages import synthesize_pages

        d = str(tmp_path)
        pq.write_table(synthesize_pages(60), os.path.join(d, "pages.parquet"))
        full = read_pages_window(d).count()
        assert full == 60
        win = read_pages_window(
            d, since=dt.datetime(2013, 1, 10), until=dt.datetime(2013, 1, 20)
        )
        rows = win.to_pandas()
        assert 0 < len(rows) < 60
        assert (rows["warc_ts"] >= dt.datetime(2013, 1, 10)).all()
        assert (rows["warc_ts"] < dt.datetime(2013, 1, 20)).all()

    def test_daily_window(self):
        from marc2rdf_ray.sources.incremental import daily_window

        s, u = daily_window(dt.datetime(2026, 8, 17, 15, 30))
        assert s == dt.datetime(2026, 8, 16)
        assert u == dt.datetime(2026, 8, 17)


class TestHarvester:
    """Config-driven XML harvester (batch_harvest.rb fetch surface with the
    network replaced by a keyed response table)."""

    CONFIG = {
        "id": "xisbn",
        "protocol": "http",
        "url": {
            "prefix": "http://xisbn.example.org/isbn/",
            "suffix": "?method=getEditions&format=xml",
        },
        "local": {"subject": "edition", "predicate": "BIBO.isbn"},
        "remote": {
            "predicates": {
                "BIBO.isbn": {"datatype": "literal", "xpath": "//xmlns:isbn"},
                "FOAF.depiction": {
                    "datatype": "uri",
                    "xpath": "//xmlns:cover",
                    "regex_strip": r"\?size=\w+",
                },
            },
            "namespaces": {},
        },
        "limits": {"max_limit": "5"},
    }

    def test_extracts_reference_fixture(self, ray_session):
        import ray.data as rd

        from marc2rdf_ray.stages.harvest import harvest_triples
        from marc2rdf_ray.vocab import DEFAULT_VOCAB

        xml = open("/root/reference/spec/example.harvestresponse.xml").read()
        url = ("http://xisbn.example.org/isbn/9788203192128"
               "?method=getEditions&format=xml")
        triples = rd.from_items([
            {"subj": "http://ex.org/ed/1",
             "pred": DEFAULT_VOCAB.resolve("BIBO.isbn"),
             "obj": "9788203192128", "obj_kind": "literal",
             "lang": None, "src": "http://ex.org/ed/1"},
            {"subj": "http://ex.org/ed/1", "pred": "http://other/pred",
             "obj": "x", "obj_kind": "literal", "lang": None,
             "src": "http://ex.org/ed/1"},
        ])
        out = harvest_triples(
            triples, self.CONFIG, {url: xml}
        ).to_pandas()
        isbns = out[out["pred"] == DEFAULT_VOCAB.resolve("BIBO.isbn")]
        # max_limit=5 caps the fixture's long isbn list
        assert len(isbns) == 5
        assert isbns["obj"].iloc[0] == "9788770530934"
        assert (out["src"] == "harvest:xisbn:9788203192128").all()

    def test_regex_strip_and_uri_coercion(self, ray_session):
        import ray.data as rd

        from marc2rdf_ray.stages.harvest import harvest_triples
        from marc2rdf_ray.vocab import DEFAULT_VOCAB

        xml = (
            '<rsp xmlns="http://worldcat.org/xid/isbn/">'
            "<cover>http://img.example.org/c/1.jpg?size=large</cover>"
            "<cover>  </cover>"
            "</rsp>"
        )
        url = ("http://xisbn.example.org/isbn/123"
               "?method=getEditions&format=xml")
        triples = rd.from_items([
            {"subj": "http://ex.org/ed/2",
             "pred": DEFAULT_VOCAB.resolve("BIBO.isbn"),
             "obj": "123", "obj_kind": "literal", "lang": None,
             "src": "http://ex.org/ed/2"},
        ])
        out = harvest_triples(triples, self.CONFIG, {url: xml}).to_pandas()
        dep = out[out["pred"] == DEFAULT_VOCAB.resolve("FOAF.depiction")]
        assert list(dep["obj"]) == ["http://img.example.org/c/1.jpg"]
        assert list(dep["obj_kind"]) == ["uri"]

    def test_sparql_list_config_rejected(self):
        import json

        import pytest

        from marc2rdf_ray.stages.harvest import HarvesterConfig

        docs = json.load(open("/root/reference/config/templates/harvest.json"))
        with pytest.raises(ValueError):
            HarvesterConfig(docs[0])  # sparql list-style
        cfg = HarvesterConfig(docs[1])  # xpath dict-style parses
        assert cfg.url_prefix.startswith("http://xisbn.worldcat.org/")
        assert cfg.max_limit == 10
