"""N-Triples serialization unit tests (rdfmodeler.rb:314-324 analog)."""

from marc2rdf_ray.functions.ntriples import (
    escape_literal,
    format_term,
    format_triple,
)


class TestEscaping:
    def test_basic_escapes(self):
        assert escape_literal('a"b\\c\nd\te\r') == 'a\\"b\\\\c\\nd\\te\\r'

    def test_utf8_preserved(self):
        # N-Triples 1.1: UTF-8 literals unescaped
        assert escape_literal("Bjørn Ægir") == "Bjørn Ægir"


class TestTerms:
    def test_uri(self):
        assert format_term("http://x/y", "uri") == "<http://x/y>"

    def test_plain_literal(self):
        assert format_term("v", "literal") == '"v"'

    def test_lang_literal(self):
        assert format_term("v", "literal", "no") == '"v"@no'

    def test_typed_literals(self):
        assert format_term("202", "integer") == (
            '"202"^^<http://www.w3.org/2001/XMLSchema#integer>'
        )
        assert format_term("2.5", "float") == (
            '"2.5"^^<http://www.w3.org/2001/XMLSchema#float>'
        )


class TestTriples:
    def test_full_line(self):
        assert format_triple("http://s", "http://p", "o", "literal") == (
            '<http://s> <http://p> "o" .'
        )

    def test_invalid_skipped(self):
        # write_ntriples skips invalid statements (rdfmodeler.rb:317-321)
        assert format_triple("", "http://p", "o", "literal") is None
        assert format_triple("http://s", "", "o", "literal") is None
        assert format_triple("http://s", "http://p", None, "literal") is None
