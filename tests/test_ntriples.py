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


class TestNTriplesReader:
    def test_roundtrip_through_writer(self, ray_session):
        """format_triple -> parse_line inverts exactly for every kind the
        writer emits: URIs, plain/lang literals with all five escapes,
        integer and float typed literals."""
        from marc2rdf_ray.functions.ntriples import format_triple
        from marc2rdf_ray.sources.ntriples import parse_line

        rows = [
            ("http://s/1", "http://p/a", "http://o/x", "uri", None),
            ("http://s/1", "http://p/b", 'say "hi"\n\t\\ done', "literal",
             None),
            ("http://s/2", "http://p/c", "bonjour\rmonde", "literal", "fr"),
            ("http://s/2", "http://p/d", "42", "integer", None),
            ("http://s/3", "http://p/e", "3.14", "float", None),
        ]
        for subj, pred, obj, kind, lang in rows:
            line = format_triple(subj, pred, obj, kind, lang)
            assert line is not None
            got = parse_line(line)
            assert got == (subj, pred, obj, kind, lang)

    def test_reader_reads_flagship_output(self, ray_session, tmp_path):
        """read_ntriples over the flagship's own partitioned .nt.gz dump
        recovers exactly the rows of the parquet edge tables (bulk-load
        round trip, reference K5)."""
        import os

        import pyarrow.parquet as _pq

        from marc2rdf_ray.config import PipelineConfig
        from marc2rdf_ray.pipelines.kg import run_kg_pipeline
        from marc2rdf_ray.sources.ntriples import read_ntriples
        from marc2rdf_ray.sources.pages import write_pages_dataset

        pages = str(tmp_path / "pages")
        graph = str(tmp_path / "graph")
        write_pages_dataset(pages, 60, seed=7)
        run_kg_pipeline(pages, graph, PipelineConfig())

        nt_files, pq_rows = [], set()
        for d in sorted(os.listdir(graph)):
            if not d.startswith("part="):
                continue
            nt_files.append(os.path.join(graph, d, "edges.nt.gz"))
            t = _pq.read_table(os.path.join(graph, d, "edges.parquet"))
            pq_rows |= set(
                zip(*[t[c].to_pylist() for c in ("subj", "pred", "obj")])
            )

        back = read_ntriples(nt_files).to_pandas()
        got = set(zip(back["subj"], back["pred"], back["obj"]))
        # NT lines skip writer-invalid statements; everything else must
        # round-trip (this corpus has no invalid IRIs, so sets are equal)
        assert got == pq_rows

    def test_reader_skips_garbage_lines(self, ray_session, tmp_path):
        from marc2rdf_ray.sources.ntriples import read_ntriples

        p = tmp_path / "x.nt"
        p.write_text(
            "<http://s> <http://p> <http://o> .\n"
            "# comment\n"
            "\n"
            "not a triple at all\n"
            '<http://s> <http://p> "lit"@en .\n'
        )
        out = read_ntriples(str(p)).to_pandas()
        assert len(out) == 2
        assert set(out["obj_kind"]) == {"uri", "literal"}
        assert out[out["obj_kind"] == "literal"]["lang"].iloc[0] == "en"
