"""Golden rule-engine tests mirroring the reference's conversion specs
(/root/reference/spec/rdfmodeler_spec.rb:97-355) on the reference's own
MARCXML fixture corpus (read-only data at /root/reference/spec)."""

import json

import pytest

from marc2rdf_ray.rules import RuleEngine, RuleSet
from marc2rdf_ray.sources.marcxml import read_marc_binary, read_marcxml

FIXTURE_XML = "/root/reference/spec/example.normarc.xml"
FIXTURE_BIN = "/root/reference/spec/example.binary.normarc.mrc"
SKELETON = "/root/reference/config/templates/mapping_skeleton.json"


@pytest.fixture(scope="module")
def records():
    return list(read_marcxml(FIXTURE_XML))


def engine(tags: dict) -> RuleEngine:
    # library config analog of spec:99-102
    return RuleEngine(
        RuleSet({"tags": tags}),
        base="http://data.deichman.no/resource/",
        prefix="tnr_",
        identifier_tag="001",
    )


def objs(triples):
    return [(t[1], t[2], t[3]) for t in triples]


def all_values(triples):
    return " | ".join(f"{t[1]} {t[2]} {t[3]} {t[4]}" for t in triples)


class TestBinaryReader:
    # spec:4-22
    def test_reads_binary_records(self):
        recs = list(read_marc_binary(FIXTURE_BIN))
        assert len(recs) >= 1
        eng = engine(json.load(open(SKELETON))["tags"])
        triples = eng.convert(recs[0])
        assert len(triples) >= 1


class TestLiterals:
    # spec:115-129
    def test_modified_mapping_literal(self, records):
        eng = engine({
            "020": {"subfield": {"a": {
                "predicate": "BIBO.isbn",
                "object": {"datatype": "literal"},
            }}}
        })
        t = eng.convert(records[0])
        assert "http://purl.org/ontology/bibo/isbn" in all_values(t)

    # spec:131-146
    def test_integer_literal(self, records):
        eng = engine({
            "300": {"subfield": {"a": {
                "predicate": "BIBO.isbn",
                "object": {"datatype": "integer", "regex_strip": "[\\D]+"},
            }}}
        })
        t = eng.convert(records[0])
        assert ("http://purl.org/ontology/bibo/isbn", "202", "integer") in objs(t)

    # spec:147-162
    def test_float_literal(self, records):
        eng = engine({
            "300": {"subfield": {"a": {
                "predicate": "BIBO.isbn",
                "object": {"datatype": "float", "regex_strip": "[\\D]+"},
            }}}
        })
        t = eng.convert(records[0])
        assert ("http://purl.org/ontology/bibo/isbn", "202", "float") in objs(t)


class TestUris:
    # spec:166-189
    def test_control_008_audience(self, records):
        eng = engine({
            "008": {"audience": {
                "predicate": "DC.audience",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://data.deichman.no/audience/",
                    "substr_length": 1,
                    "regex_substitute": {
                        "default": "adult",
                        "subs": {"a": "adult", "j": "juvenile"},
                        "orig": "a|j",
                    },
                    "substr_offset": 22,
                },
            }}
        })
        t = eng.convert(records[0])
        assert "http://data.deichman.no/audience/adult" in all_values(t)

    # spec:190-208
    def test_control_008_language_relation_class(self, records):
        eng = engine({
            "008": {"language": {
                "predicate": "DC.language",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://lexvo.org/id/iso639-3/",
                    "substr_length": 3,
                    "substr_offset": 35,
                },
                "relation": {"class": "LVONT.Language"},
            }}
        })
        t = eng.convert(records[0])
        assert "http://lexvo.org/ontology#Language" in all_values(t)

    # spec:210-230
    def test_datafield_format_uri_substitute(self, records):
        eng = engine({
            "019": {"subfield": {"b": {
                "predicate": "DC.format",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://data.deichman.no/format/",
                    "regex_substitute": {
                        "default": "Document",
                        "subs": {"l": "Book"},
                        "orig": "l",
                    },
                },
            }}}
        })
        t = eng.convert(records[0])
        assert "http://data.deichman.no/format/Book" in all_values(t)

    # spec:231-254
    def test_condition_on_subfield(self, records):
        eng = engine({
            "700": {"subfield": {"3": {
                "object": {
                    "datatype": "uri",
                    "prefix": "http://example.com/person/x",
                },
                "conditions": {"subfield": {"e": {
                    "default": "DC.contributor",
                    "subs": {"overs": "BIBO.translator"},
                    "orig": "overs",
                }}},
            }}}
        })
        t = eng.convert(records[1])
        assert "http://purl.org/ontology/bibo/translator" in all_values(t)

    # spec:255-278
    def test_condition_failed_uses_default(self, records):
        eng = engine({
            "700": {"subfield": {"3": {
                "object": {
                    "datatype": "uri",
                    "prefix": "http://example.com/person/x",
                },
                "conditions": {"subfield": {"e": {
                    "default": "DC.contributor",
                    "subs": {"overs": "BIBO.translator"},
                    "orig": "nonexistingcondition",
                }}},
            }}}
        })
        t = eng.convert(records[1])
        assert "http://purl.org/dc/terms/contributor" in all_values(t)

    # spec:279-302
    def test_condition_missing_subfield_uses_default(self, records):
        eng = engine({
            "700": {"subfield": {"3": {
                "object": {
                    "datatype": "uri",
                    "prefix": "http://example.com/person/x",
                },
                "conditions": {"subfield": {"nonexistingsubfield": {
                    "default": "DC.contributor",
                    "subs": {"ignore": "ignore"},
                    "orig": "nonexistingcondition",
                }}},
            }}}
        })
        t = eng.convert(records[1])
        assert "http://purl.org/dc/terms/contributor" in all_values(t)

    # spec:303-328
    def test_condition_indicator1(self, records):
        eng = engine({
            "240": {"subfield": {"a": {
                "object": {"datatype": "literal"},
                "conditions": {"indicator": {
                    "default": "DC.originalTitle",
                    "indicator1": {
                        "subs": {"0": "DC.originalTitle", "1": "DC.uniformTitle"},
                        "orig": "0|1",
                    },
                }},
            }}}
        })
        t = eng.convert(records[1])
        assert "http://purl.org/dc/terms/uniformTitle" in all_values(t)

    # spec:329-354
    def test_condition_indicator2(self, records):
        eng = engine({
            "245": {"subfield": {"a": {
                "object": {"datatype": "literal"},
                "conditions": {"indicator": {
                    "default": "DC.anyTitle",
                    "indicator2": {
                        "subs": {"0": "DC.someTitle", "1": "DC.anotherTitle"},
                        "orig": "0|1",
                    },
                }},
            }}}
        })
        t = eng.convert(records[1])
        assert "http://purl.org/dc/terms/someTitle" in all_values(t)


class TestEngineSemantics:
    def test_set_type_comma_list(self, records):
        eng = engine({})
        eng.resource_type = "BIBO.Document, FABIO.Work"
        t = eng.convert(records[0])
        vals = [x[2] for x in t]
        assert "http://purl.org/ontology/bibo/Document" in vals
        assert "http://purl.org/spar/fabio/Work" in vals

    def test_regex_tag_keys_fire_on_match(self, records):
        # the skeleton's negative-lookahead 5xx key (rdfmodeler.rb:155)
        from marc2rdf_ray.model import Field, Record

        rules = {
            "^5(?!03|20|21|46|71|72|73|74|90|92|95|99)": {"subfield": {"a": {
                "predicate": "DC.description",
                "object": {"datatype": "literal", "lang": ":no"},
            }}}
        }
        eng = engine(rules)
        rec = Record(
            fields=[
                Field(tag="001", value="x1"),
                Field(tag="505", subfields=[("a", "a content note")]),
                Field(tag="599", subfields=[("a", "excluded by lookahead")]),
            ]
        )
        t = eng.convert(rec)
        assert [(x[2], x[4]) for x in t
                if x[1] == "http://purl.org/dc/terms/description"] == [
            ("a content note", "no")
        ]

    def test_repeated_tags_all_fire(self, records):
        # record 0 has two 691 fields (rdfmodeler.rb:151-158)
        eng = engine({
            "691": {"subfield": {"3": {
                "predicate": "DC.subject",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://data.deichman.no/subjectFiction/x",
                },
            }}}
        })
        t = eng.convert(records[0])
        subjects = [x[2] for x in t if x[1] == "http://purl.org/dc/terms/subject"]
        assert len(subjects) == 2

    def test_full_skeleton_runs_on_all_fixture_records(self, records):
        eng = RuleEngine(
            RuleSet(json.load(open(SKELETON))),
            base="http://data.deichman.no/resource/",
            prefix="tnr_",
            identifier_tag="001",
            resource_type="BIBO.Document",
        )
        total = 0
        for rec in records:
            t = eng.convert(rec)
            assert len(t) >= 1
            total += len(t)
        assert total > 100

    def test_duplicate_triples_preserved(self, records):
        # converter emits duplicates; no dedup (SURVEY.md §2.7 O3)
        eng = engine({
            "245|245": {"subfield": {"a": {
                "predicate": "DC.title",
                "object": {"datatype": "literal"},
            }}},
            "245": {"subfield": {"a": {
                "predicate": "DC.title",
                "object": {"datatype": "literal"},
            }}},
        })
        t = eng.convert(records[0])
        titles = [x for x in t if x[1] == "http://purl.org/dc/terms/title"]
        assert len(titles) == 2


class TestMappingValidation:
    """Schema validation at RuleSet construction (SURVEY.md §2.10): the
    reference checks only JSON well-formedness (mapping.rb:71-78); a typo'd
    option there silently drops triples, here it fails loudly."""

    def test_reference_skeleton_validates(self):
        import json

        from marc2rdf_ray.rules import RuleSet

        RuleSet(json.load(open(
            "/root/reference/config/templates/mapping_skeleton.json")))

    def test_malformed_mappings_raise(self):
        import pytest

        from marc2rdf_ray.rules import MappingError, RuleSet

        bad = [
            # typo'd object option
            {"tags": {"245": {"subfield": {"a": {"object": {"sustr_offset": 3}}}}}},
            # invalid datatype enum
            {"tags": {"245": {"subfield": {"a": {"object": {"datatype": "int"}}}}}},
            # tag key not a regex
            {"tags": {"([": {}}},
            # unknown conditions key
            {"tags": {"245": {"subfield": {"a": {"conditions": {"typo": {}}}}}}},
            # relation without class
            {"tags": {"245": {"subfield": {"a": {"relation": {}}}}}},
            # non-integer substr
            {"tags": {"008": {"r": {"object": {"substr_offset": "21"}}}}},
            # combine not a list
            {"tags": {"245": {"subfield": {"a": {"object": {"combine": "ab"}}}}}},
        ]
        for m in bad:
            with pytest.raises(MappingError):
                RuleSet(m)


class TestPredicatePruning:
    """RuleSet.pruned: predicate pushdown into the rule engine."""

    def _mapping(self):
        return {
            "tags": {
                "245": {
                    "subfield": {
                        "a": {
                            "predicate": "DC.title",
                            "object": {"datatype": "literal"},
                        },
                        "b": {
                            "conditions": {
                                "subfield": {
                                    "c": {
                                        "orig": "x|y",
                                        "subs": {"x": "DC.creator"},
                                        "default": "DC.contributor",
                                    }
                                }
                            },
                            "object": {"datatype": "literal"},
                        },
                    }
                },
                "100": {
                    "subfield": {
                        "a": {
                            "predicate": "DC.creator",
                            "relation": {
                                "class": "FOAF.Person",
                                "subfield": {
                                    "d": {
                                        "predicate": "DC.date",
                                        "object": {"datatype": "literal"},
                                    }
                                },
                            },
                            "object": {"datatype": "uri"},
                        }
                    }
                },
                "008": {
                    "r": {
                        "predicate": "DC.language",
                        "object": {"datatype": "literal"},
                    }
                },
            }
        }

    def test_prune_keeps_exactly_matching_rules(self):
        from marc2rdf_ray.rules import RuleSet
        from marc2rdf_ray.vocab import DEFAULT_VOCAB

        rs = RuleSet(self._mapping())
        lang = DEFAULT_VOCAB.resolve("DC.language")
        p = rs.pruned({lang})
        assert list(p.mapping["tags"].keys()) == ["008"]

    def test_conditioned_predicates_count_all_rewrites(self):
        from marc2rdf_ray.rules import RuleSet
        from marc2rdf_ray.vocab import DEFAULT_VOCAB

        rs = RuleSet(self._mapping())
        contributor = DEFAULT_VOCAB.resolve("DC.contributor")
        p = rs.pruned({contributor})
        assert list(p.mapping["tags"].keys()) == ["245"]
        assert list(p.mapping["tags"]["245"]["subfield"].keys()) == ["b"]

    def test_relation_subpredicates_and_type_retain_rule(self):
        from marc2rdf_ray.rules import RuleSet
        from marc2rdf_ray.vocab import DEFAULT_VOCAB, RDF_TYPE

        rs = RuleSet(self._mapping())
        date = DEFAULT_VOCAB.resolve("DC.date")
        assert list(rs.pruned({date}).mapping["tags"].keys()) == ["100"]
        # relation rules assert rdf:type on the minted entity
        assert "100" in rs.pruned({RDF_TYPE}).mapping["tags"]

    def test_pruned_output_is_filtered_full_output(self):
        from marc2rdf_ray.model import Field, Record
        from marc2rdf_ray.rules import RuleEngine, RuleSet
        from marc2rdf_ray.vocab import DEFAULT_VOCAB

        mapping = self._mapping()
        rec = Record(
            fields=[
                Field(tag="001", value="r1"),
                Field(tag="245", subfields=[("a", "T"), ("b", "B"), ("c", "x")]),
                Field(tag="100", subfields=[("a", "Auth"), ("d", "1900")]),
                Field(tag="008", value="eng"),
            ],
            record_id="r1",
        )
        full = RuleEngine(RuleSet(mapping)).convert(rec)
        for name in ("DC.title", "DC.creator", "DC.date", "DC.language"):
            keep = {DEFAULT_VOCAB.resolve(name)}
            pruned = RuleEngine(RuleSet(mapping).pruned(keep)).convert(rec)
            assert [t for t in pruned if t[1] in keep] == [
                t for t in full if t[1] in keep
            ]
            assert all(t in full for t in pruned)

    def test_prune_to_nothing_gives_empty_ruleset(self):
        from marc2rdf_ray.rules import RuleSet

        rs = RuleSet(self._mapping())
        p = rs.pruned({"http://example.org/nope"})
        assert p.mapping["tags"] == {}
