"""Property-based tests (hypothesis) for the byte-exact scalar ops."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from marc2rdf_ray.functions.ntriples import escape_literal, format_triple
from marc2rdf_ray.functions.textops import (
    generate_objects,
    generate_uri,
    replace_characters,
    ruby_strip,
    urlize,
)

text = st.text(max_size=80)
printable = st.text(alphabet=string.printable, max_size=60)


class TestUrlizeProperties:
    @given(text)
    @settings(max_examples=200)
    def test_default_urlize_output_alphabet(self, s):
        out = urlize(s, downcase=True, convert_spaces=True)
        assert re.fullmatch(r"[-_A-Za-z0-9]*", out)

    @given(text)
    def test_idempotent(self, s):
        once = urlize(s, downcase=True, convert_spaces=True)
        twice = urlize(once, downcase=True, convert_spaces=True)
        assert once == twice

    @given(text)
    def test_replacecharacters_only_touches_mapped(self, s):
        out = replace_characters(s)
        # unmapped chars preserved in order
        from marc2rdf_ray.functions.textops import _TRANSLATE_TABLE

        expected = "".join(_TRANSLATE_TABLE.get(ord(c), c) for c in s)
        assert out == expected


class TestGenerateObjectsProperties:
    @given(text, st.integers(0, 100), st.integers(0, 100))
    def test_substr_never_out_of_range(self, s, off, ln):
        out = generate_objects(s, substr_offset=off, substr_length=ln)
        assert all(isinstance(o, str) for o in out)
        if out:
            assert len(s) >= off + ln

    @given(printable)
    def test_split_drops_empties(self, s):
        out = generate_objects(s, regex_split=", *")
        assert "" not in out
        assert "".join(out).replace(" ", "") == re.sub(
            r", *", "", s
        ).replace(" ", "")

    @given(text)
    def test_whole_string_default(self, s):
        assert generate_objects(s) == [s]


class TestUriProperties:
    @given(printable)
    def test_kind_is_uri_or_literal(self, s):
        val, kind = generate_uri(s, "http://example.com/")
        assert kind in ("uri", "literal")
        assert val == f"http://example.com/{s}"

    @given(st.text(alphabet=string.ascii_letters + string.digits, min_size=1,
                   max_size=20))
    def test_clean_values_make_uris(self, s):
        assert generate_uri(s, "http://example.com/")[1] == "uri"


class TestNtProperties:
    @given(text)
    def test_escape_roundtrip_via_unescape(self, s):
        esc = escape_literal(s)
        # no raw quote survives unescaped
        assert '"' not in esc.replace('\\"', "")
        # left-to-right unescape (sentinel-free)
        out, i = [], 0
        rev = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
        while i < len(esc):
            if esc[i] == "\\" and i + 1 < len(esc) and esc[i + 1] in rev:
                out.append(rev[esc[i + 1]])
                i += 2
            else:
                out.append(esc[i])
                i += 1
        assert "".join(out) == s

    @given(text, text)
    def test_format_triple_shape(self, s, o):
        line = format_triple("http://s", "http://p", o, "literal")
        assert line is not None
        assert line.startswith("<http://s> <http://p> ") and line.endswith(" .")


class TestRubyStripProperties:
    @given(text)
    def test_strip_subset_of_python(self, s):
        # ruby strip removes only ASCII ws; result contains python-strip
        assert ruby_strip(s).strip() == s.strip(" \t\n\r\f\v\x00").strip()


class TestSessionizeProperties:
    def test_conservation_invariants(self, ray_session):
        """Sessions PARTITION the event stream: event counts and integer
        cents are conserved exactly, and session starts are unique per
        user (random input, fixed seed)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from marc2rdf_ray.ops.windows import sessionize

        rng = np.random.RandomState(11)
        n = 4000
        users = rng.randint(0, 40, n)
        base = 1_700_000_000_000_000
        ts = base + rng.randint(0, 3 * 24 * 3600, n).astype(np.int64) * 1_000_000
        vals = np.round(rng.rand(n) * 100, 2)
        tab = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
            }
        )
        out = sessionize(rd.from_arrow(tab)).to_pandas()
        assert out["n_events"].sum() == n
        want_cents = int(np.round(vals * 100).astype(np.int64).sum())
        assert int(out["sum_value_cents"].sum()) == want_cents
        assert not out.duplicated(["user_id", "session_start_us"]).any()
        # every session start is an actual event timestamp of that user
        by_user = {u: set(ts[users == u].tolist()) for u in set(users)}
        assert all(
            r.session_start_us in by_user[r.user_id]
            for r in out.itertuples()
        )


class TestProbePositions:
    """The union-lexsort merge primitive behind asof_join/range_join
    (ops/joins.py:_probe_positions): for each probe, the count of right
    rows at-or-before it in (key, time, tie) order must equal the brute
    count -- including exact ties, duplicate keys, and negative times."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(-5, 5), st.integers(0, 9)),
            max_size=40,
        ),
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(-5, 5)), max_size=30
        ),
        st.booleans(),
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_brute_count(self, right, left, left_first):
        import numpy as np

        from marc2rdf_ray.ops.joins import _probe_positions

        rk = np.array([r[0] for r in right], np.int64)
        rt = np.array([r[1] for r in right], np.int64)
        rtie = np.array([r[2] for r in right], np.int64)
        lk = np.array([l[0] for l in left], np.int64)
        lt = np.array([l[1] for l in left], np.int64)
        ltie = np.full(len(left), np.iinfo(np.int64).max, np.int64)
        got = _probe_positions(rk, rt, rtie, lk, lt, ltie, left_first)
        for i in range(len(left)):
            probe = (lk[i], lt[i], ltie[i], 1 if not left_first else 0)
            want = sum(
                1
                for j in range(len(right))
                if (rk[j], rt[j], rtie[j], 0 if not left_first else 1) <= probe
            )
            assert got[i] == want, (i, probe, got[i], want)

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(-4, 4)), max_size=30
        ),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(-4, 4)), max_size=25
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_range_bounds_brute(self, right, left):
        """range_join's two-probe shape: zero ties on both sides, exclusive
        lower (left_first=True) and inclusive upper (left_first=False)
        bound counts must match strict/<= brute counts."""
        import numpy as np

        from marc2rdf_ray.ops.joins import _probe_positions

        rk = np.array([r[0] for r in right], np.int64)
        rt = np.array([r[1] for r in right], np.int64)
        z_r = np.zeros(len(right), np.int64)
        lk = np.array([l[0] for l in left], np.int64)
        lt = np.array([l[1] for l in left], np.int64)
        z_l = np.zeros(len(left), np.int64)
        lo = _probe_positions(rk, rt, z_r, lk, lt, z_l, left_first=True)
        hi = _probe_positions(rk, rt, z_r, lk, lt, z_l, left_first=False)
        for i in range(len(left)):
            strict = sum(
                1 for j in range(len(right))
                if (rk[j], rt[j]) < (lk[i], lt[i])
            )
            at_or_before = sum(
                1 for j in range(len(right))
                if (rk[j], rt[j]) <= (lk[i], lt[i])
            )
            assert lo[i] == strict
            assert hi[i] == at_or_before


class TestChunkBatchProperties:
    """chunk_batch (ops/corpus.py) invariants on arbitrary unicode text."""

    @given(st.lists(st.text(max_size=50), max_size=8), st.integers(1, 7))
    @settings(max_examples=150, deadline=None)
    def test_concat_roundtrip_and_bounds(self, texts, width):
        import pyarrow as pa

        from marc2rdf_ray.ops.corpus import chunk_batch

        b = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = chunk_batch(b, width)
        by_doc = {}
        for i, cid, chunk in zip(
            out["doc_id"].to_pylist(),
            out["chunk_id"].to_pylist(),
            out["chunk"].to_pylist(),
        ):
            by_doc.setdefault(i, []).append((cid, chunk))
        for i, t in enumerate(texts):
            got = sorted(by_doc.get(i, []))
            # chunk ids are dense 0..k-1; concat reproduces the text
            assert [c for c, _ in got] == list(range(len(got)))
            assert "".join(ch for _, ch in got) == t
            # every chunk is non-empty and at most width codepoints
            assert all(0 < len(ch) <= width for _, ch in got)
