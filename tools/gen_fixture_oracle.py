"""Generate the golden-triple VALUES oracle for marc_fixture_convert.

The reference's MARCXML fixture corpus (spec/example.normarc.xml) has a
deterministic conversion under the skeleton mapping; no SQL view can parse
MARCXML, so the oracle is the expected triple set itself, as an ANSI-SQL
VALUES literal.  Provenance: produced by the in-process record-at-a-time
converter whose per-operator semantics are pinned byte-for-byte against
the reference's RSpec golden cases (tests/test_rules.py, test_textops.py)
and whose output the distributed path must match at P/R=1.0
(tests/test_parity.py).  Regenerate ONLY when the mapping semantics
legitimately change:  python tools/gen_fixture_oracle.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/marc2rdf_ray/templates/marc_fixture_expected.sql"


def esc(s: str) -> str:
    return s.replace("'", "''")


def main() -> None:
    from marc2rdf_ray.entry_queries import marc_fixture_convert

    tab = marc_fixture_convert("")
    rows = tab.to_pylist()
    values = ",\n".join(
        f"('{esc(r['subj'])}', '{esc(r['pred'])}', '{esc(r['obj'])}', "
        f"'{esc(r['obj_kind'])}')"
        for r in rows
    )
    sql = (
        "SELECT * FROM (VALUES\n"
        + values
        + "\n) AS t(subj, pred, obj, obj_kind)\n"
    )
    with open(OUT, "w") as f:
        f.write(sql)
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
