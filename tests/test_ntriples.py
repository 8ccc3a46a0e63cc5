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


class TestFormatBatchArrow:
    """Vectorized formatter must match the row-wise reference exactly."""

    def test_differential_random(self):
        import random

        import pyarrow as pa

        from marc2rdf_ray.functions.ntriples import (
            format_batch,
            format_batch_arrow,
        )

        rng = random.Random(7)
        kinds = ["uri", "literal", "integer", "float"]
        weird = ["ok", 'quo"te', "back\\slash", "new\nline", "tab\there",
                 "space in uri", "<angle>", "", "fin{e}", "café"]
        rows = []
        for i in range(500):
            rows.append({
                "subj": rng.choice(["http://ex.org/s", "bad uri", "",
                                    "http://ex.org/s2"]),
                "pred": rng.choice(["http://ex.org/p", "http://ex.org/p2",
                                    "no`tick"]),
                "obj": rng.choice(weird + [None]),
                "obj_kind": rng.choice(kinds),
                "lang": rng.choice([None, "", "no", "en"]),
            })
        tab = pa.Table.from_pylist(rows)
        want = format_batch(
            [r["subj"] for r in rows], [r["pred"] for r in rows],
            [r["obj"] for r in rows], [r["obj_kind"] for r in rows],
            [r["lang"] for r in rows],
        )
        got = format_batch_arrow(tab)
        assert got == want
        assert len(got) > 50  # meaningful sample survived

    def test_empty(self):
        import pyarrow as pa

        from marc2rdf_ray.functions.ntriples import format_batch_arrow

        tab = pa.table({"subj": pa.array([], pa.string()),
                        "pred": pa.array([], pa.string()),
                        "obj": pa.array([], pa.string()),
                        "obj_kind": pa.array([], pa.string())})
        assert format_batch_arrow(tab) == []

    def test_payload_differential(self):
        """format_batch_arrow_payload == newline-join of the line list
        (the write path never materializes per-line Python strings)."""
        import random

        import pyarrow as pa

        from marc2rdf_ray.functions.ntriples import (
            format_batch_arrow,
            format_batch_arrow_payload,
        )

        rng = random.Random(11)
        kinds = ["uri", "literal", "integer", "float"]
        weird = ["ok", 'quo"te', "back\\slash", "new\nline", "tab\there",
                 "space in uri", "<angle>", "", "fin{e}", "café"]
        rows = []
        for i in range(300):
            rows.append({
                "subj": rng.choice(["http://ex.org/s", "bad uri",
                                    "http://ex.org/s2"]),
                "pred": rng.choice(["http://ex.org/p", "no`tick"]),
                "obj": rng.choice(weird + [None]),
                "obj_kind": rng.choice(kinds),
                "lang": rng.choice([None, "", "no", "en"]),
            })
        tab = pa.Table.from_pylist(rows)
        lines = format_batch_arrow(tab)
        want = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
        assert format_batch_arrow_payload(tab) == want
        empty = tab.slice(0, 0)
        assert format_batch_arrow_payload(empty) == b""
