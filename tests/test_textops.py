"""Unit tests for the byte-exact scalar ops, mirroring the reference's
generate_objects/generate_uri specs case by case
(/root/reference/spec/rdfmodeler_spec.rb:24-95)."""

from marc2rdf_ray.functions.textops import (
    generate_objects,
    generate_uri,
    replace_characters,
    ruby_strip,
    urlize,
)
from marc2rdf_ray.model import Field


def go(s, **kw):
    return generate_objects(s, **kw)


class TestSubstr:
    # spec:32-35
    def test_offset_and_length(self):
        assert go("abcdef", substr_offset=2, substr_length=4) == ["cdef"]

    # spec:37-40
    def test_out_of_range_returns_empty(self):
        assert go("abcdef", substr_offset=11, substr_length=1) == []

    def test_blank_slice_dropped(self):
        assert go("ab    cd", substr_offset=2, substr_length=3) == []


class TestGenerateUri:
    # spec:42-45
    def test_valid_uri(self):
        assert generate_uri("abcdef", "http://example.com/") == (
            "http://example.com/abcdef",
            "uri",
        )

    # spec:47-50
    def test_invalid_characters_literal(self):
        val, kind = generate_uri("abcdef", "http:||example.com")
        assert kind == "literal"

    # spec:52-56
    def test_missing_scheme_literal(self):
        val, kind = generate_uri("abcdef", "www.example.com")
        assert kind == "literal"

    def test_space_literal(self):
        assert generate_uri("a b", "http://example.com/")[1] == "literal"


class TestSplitAndSubstitute:
    # spec:58-66 -- capture-group split keeps captures, empties dropped
    def test_split_then_substitute(self):
        assert go(
            "abcdef",
            regex_split=r"(\w{2})",
            regex_substitute={
                "orig": "ab|cd|ef",
                "subs": {"ab": "AA", "cd": "BB", "ef": "CC"},
                "default": "ZERO",
            },
        ) == ["AA", "BB", "CC"]

    def test_no_match_passes_normalized_value_through(self):
        # reference rdfmodeler.rb:96-104: on scan miss the normalized object
        # survives; 'default' is NOT applied in this path.
        assert go(
            "zz",
            regex_substitute={"orig": "a|b", "subs": {"a": "A"}, "default": "D"},
        ) == ["zz"]

    def test_normalization_is_ascii_nonword_strip_plus_downcase(self):
        assert go(
            "B.u!",
            regex_substitute={"orig": "bu", "subs": {"bu": "8-9"}, "default": "all"},
        ) == ["8-9"]

    def test_last_match_wins(self):
        assert go(
            "anp",
            regex_substitute={
                "orig": "a|n|p",
                "subs": {"a": "A", "n": "N", "p": "P"},
                "default": "D",
            },
        ) == ["P"]

    def test_split_empties_dropped(self):
        assert go("a, b, c", regex_split=", *") == ["a", "b", "c"]


class TestCombine:
    # spec:67-74
    def test_combine_with_combinestring(self):
        fld = Field(
            tag="245", subfields=[("a", "A Title"), ("b", "A Subtitle")]
        )
        assert go(
            "whatever",
            marcfield=fld,
            combine=["a", "b"],
            combinestring=" : ",
        ) == ["A Title : A Subtitle"]

    def test_combine_repeated_codes_in_combine_order(self):
        fld = Field(tag="699", subfields=[("x", "X1"), ("a", "A"), ("x", "X2")])
        assert go(
            "v", marcfield=fld, combine=["a", "x"], combinestring="_"
        ) == ["A_X1_X2"]


class TestUrlize:
    # spec:75-79
    def test_defaults_downcase_and_spaces(self):
        assert go("A Simple String", urlize_opt=True) == ["a_simple_string"]

    # spec:80-84
    def test_no_downcase_no_convert_spaces(self):
        assert go(
            "A Simple String",
            urlize_opt=True,
            no_downcase=True,
            no_convert_spaces=True,
        ) == ["ASimpleString"]

    # spec:85-89
    def test_char_mapping(self):
        assert go("Ægir", urlize_opt=True) == ["aegir"]

    # spec:90-94
    def test_custom_regexp(self):
        assert go("abcdef", urlize_opt=True, urlize_regexp=r"[^a-e]") == ["abcde"]

    def test_full_char_mapping_table(self):
        assert replace_characters("ÆØÅ æøå Þð") == "AeOeAa aeoeaa Thth"
        assert urlize("Bjørn Åge", downcase=True, convert_spaces=True) == (
            "bjoern_aage"
        )


class TestRegexStrip:
    def test_strip_nondigits(self):
        assert go("82-10-04798-1", regex_strip=r"[\D]+") == ["8210047981"]

    def test_ascii_w_class_strips_accents(self):
        # Ruby \W is ASCII-only: accented chars are stripped by [\W]+
        assert go("Ægir!", regex_strip=r"[\W]+") == ["gir"]

    def test_trailing_punct_strip(self):
        # only ":" matches before $; the preceding space survives (gsub)
        assert go("A title :", regex_strip=r"[\.:,;\/\s]\s*$") == ["A title "]
        assert go("A title.", regex_strip=r"[\.:,;\/\s]\s*$") == ["A title"]


class TestRubyStrip:
    def test_ascii_whitespace_only(self):
        assert ruby_strip(" x ") == " x "  # nbsp not stripped
        assert ruby_strip(" \t x \n ") == "x"


class TestSplitInvertedName:
    """A5 normalize_creatornames.isql mirror."""

    def test_inverted(self):
        from marc2rdf_ray.functions.textops import split_inverted_name

        assert split_inverted_name("Hamsun, Knut") == (
            "Hamsun", "Knut", "Knut Hamsun")
        # multiple commas: FIRST comma splits
        assert split_inverted_name("de la Cruz, Juan, Jr.") == (
            "de la Cruz", "Juan, Jr.", "Juan, Jr. de la Cruz")
        # untrimmed before-part preserved in lastName
        assert split_inverted_name(" Ibsen ,Henrik") == (
            " Ibsen ", "Henrik", "Henrik  Ibsen")

    def test_not_inverted(self):
        from marc2rdf_ray.functions.textops import split_inverted_name

        assert split_inverted_name("Halldór Laxness") == (
            None, None, "Halldór Laxness")


class TestCompiledObjectPipeline:
    """compile_object_pipeline must equal generate_objects byte-for-byte
    over the option lattice (rules.py swaps the spec mirror for the
    compiled closure in the hot loop)."""

    def test_differential_lattice(self):
        from itertools import product

        from marc2rdf_ray.functions.textops import (
            compile_object_pipeline,
            generate_objects,
        )

        class F:
            subfields = [("a", "Alpha"), ("b", "Beta"), ("a", "Aria"),
                         ("c", None)]

        inputs = [
            "Hello, World", "  padded  ", "a, b, c", "UPPER lower",
            "aeøå Æ", "x", "", "no-commas-here",
            "12345678", "Tri, cky, ", "mixed,SEP,vals",
        ]
        opt_axes = [
            ({}, {"regex_split": ", *"}, {"substr_offset": 2,
                                          "substr_length": 4}),
            ({}, {"regex_substitute": {
                "orig": "helloworld|abc|upperlower",
                "subs": {"helloworld": "HW", "abc": "letters"},
            }},),
            ({}, {"combine": ["a", "b"], "combinestring": "-"}),
            ({}, {"regex_strip": "[aeiou]"},),
            ({}, {"urlize_opt": True},
             {"urlize_opt": True, "no_downcase": True,
              "no_convert_spaces": True, "urlize_regexp": "[^A-Za-z]"}),
        ]
        n_cases = 0
        for combo in product(*opt_axes):
            opts = {}
            for c in combo:
                opts.update(c)
            full = {
                "regex_split": None, "urlize_opt": None,
                "no_downcase": False, "no_convert_spaces": False,
                "urlize_regexp": None, "regex_strip": None,
                "regex_substitute": None, "substr_offset": None,
                "substr_length": None, "combine": None,
                "combinestring": None,
            }
            full.update(opts)
            fn = compile_object_pipeline(**full)
            for s in inputs:
                want = generate_objects(s, marcfield=F(), **full)
                got = fn(s, F())
                assert got == want, (full, s, got, want)
                n_cases += 1
        assert n_cases == len(inputs) * 3 * 2 * 2 * 2 * 3

    def test_no_marcfield(self):
        from marc2rdf_ray.functions.textops import (
            compile_object_pipeline,
            generate_objects,
        )

        full = dict(combine=["a"], combinestring="+")
        fn = compile_object_pipeline(**full)
        assert fn("x") == generate_objects("x", **full)
