"""Incremental corpus flagship (pipelines/corpus.sync_corpus_windows,
round-5 task #8): two-window run == one full run at the ROW level
(doc_id, text, lang_pred, n_tokens, split, start_offset, pack_id);
resume is a no-op; late windows fold in."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _doc(i: int, flip: int = -1) -> str:
    # hash-scattered picks from a wide English pool: docs share words but
    # almost no word TRIGRAMS, so distinct docs are far apart in MinHash
    # space (a stride-cycled pool makes every doc a shifted near-dup of
    # every other and degenerates the whole corpus into one LSH cluster)
    pool = ("the quick brown fox jumps over lazy dogs while rain falls "
            "softly on ancient rooftops and distant bells ring through "
            "narrow streets carrying echoes of forgotten seasons toward "
            "silver harbour where fishermen mend their nets under pale "
            "morning light as children chase gulls along weathered piers "
            "remembering stories their grandmothers told about winters "
            "so cold even church organs froze mid hymn").split()
    out = [pool[(i * 1000003 + k * 7919 + k * k * 31) % len(pool)]
           for k in range(40)]
    out[0] = f"doc{i}"
    if flip >= 0:
        out[flip] = "CHANGED"
    return " ".join(out)


def _write(dirpath: str, rows: list) -> None:
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(dirpath, "docs.parquet"),
    )


def _rows(out_dir: str) -> list:
    cols = ["doc_id", "text", "lang_pred", "n_tokens", "split",
            "start_offset", "pack_id"]
    tabs = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            p = os.path.join(out_dir, d, "docs.parquet")
            if os.path.exists(p):
                tabs.append(pq.read_table(p).select(cols))
    if not tabs:
        return []
    t = pa.concat_tables(tabs)
    return sorted(
        tuple(t.column(c)[i].as_py() for c in cols)
        for i in range(t.num_rows)
    )


@pytest.mark.usefixtures("ray_session")
def test_two_window_sync_equals_full_run(tmp_path):
    from marc2rdf_ray.pipelines.corpus import (
        CorpusConfig,
        run_corpus_pipeline,
        sync_corpus_windows,
    )

    w1 = [(i, _doc(i)) for i in range(20)]
    w2 = ([(20 + i, _doc(20 + i)) for i in range(20)]
          + [(40, _doc(3))]          # exact cross-window dup -> dropped
          + [(41, _doc(5, flip=20))])  # near-dup of doc 5 -> dropped
    _write(str(tmp_path / "win" / "w000"), w1)
    _write(str(tmp_path / "win" / "w001"), w2)
    _write(str(tmp_path / "full"), w1 + w2)

    cfg = dict(num_partitions=4, pack_budget=100)
    m_full = run_corpus_pipeline(
        str(tmp_path / "full"), str(tmp_path / "out_full"),
        CorpusConfig(**cfg),
    )
    m_inc = sync_corpus_windows(
        str(tmp_path / "win"), str(tmp_path / "out_inc"),
        CorpusConfig(**cfg),
    )

    full_rows = _rows(str(tmp_path / "out_full"))
    inc_rows = _rows(str(tmp_path / "out_inc"))
    assert full_rows == inc_rows
    kept_ids = {r[0] for r in inc_rows}
    assert 40 not in kept_ids and 41 not in kept_ids
    assert 3 in kept_ids and 5 in kept_ids
    assert m_inc.triple_count == m_full.triple_count == len(full_rows)
    assert m_inc.extra["total_tokens"] == m_full.extra["total_tokens"]

    # resume: re-sync is a no-op (partitions untouched)
    mt = {
        d: os.path.getmtime(os.path.join(str(tmp_path / "out_inc"), d))
        for d in os.listdir(str(tmp_path / "out_inc"))
        if d.startswith("part=")
    }
    m2 = sync_corpus_windows(
        str(tmp_path / "win"), str(tmp_path / "out_inc"),
        CorpusConfig(**cfg),
    )
    assert m2.partition_counts == m_inc.partition_counts
    for d, t in mt.items():
        assert os.path.getmtime(
            os.path.join(str(tmp_path / "out_inc"), d)) == t

    # a late third window folds in and appends (no earlier rewrite)
    _write(str(tmp_path / "win" / "w002"),
           [(50 + i, _doc(50 + i)) for i in range(5)])
    m3 = sync_corpus_windows(
        str(tmp_path / "win"), str(tmp_path / "out_inc"),
        CorpusConfig(**cfg),
    )
    rows3 = _rows(str(tmp_path / "out_inc"))
    assert {r[0] for r in rows3} == kept_ids | {50 + i for i in range(5)}
    assert m3.triple_count == len(rows3)
    for d, t in mt.items():
        assert os.path.getmtime(
            os.path.join(str(tmp_path / "out_inc"), d)) == t
    # pack offsets keep accumulating per split across the append
    state = json.loads(
        open(str(tmp_path / "out_inc" / "_pack_totals.json")).read()
    )
    assert state["tokens"] == m3.extra["total_tokens"]


@pytest.mark.usefixtures("ray_session")
def test_sync_rejects_global_policies(tmp_path):
    from marc2rdf_ray.pipelines.corpus import (
        CorpusConfig,
        sync_corpus_windows,
    )

    _write(str(tmp_path / "win" / "w000"), [(0, _doc(0))])
    with pytest.raises(ValueError, match="shuffle_order"):
        sync_corpus_windows(
            str(tmp_path / "win"), str(tmp_path / "o"),
            CorpusConfig(shuffle_order=True),
        )
    with pytest.raises(ValueError, match="audit"):
        sync_corpus_windows(
            str(tmp_path / "win"), str(tmp_path / "o"),
            CorpusConfig(audit=True),
        )


@pytest.mark.usefixtures("ray_session")
def test_all_duplicate_window_commits_empty_state(tmp_path):
    """A window that is ENTIRELY duplicates of committed content must
    fold cleanly (empty survivor set -> zero parquet files -> the state
    marker still commits; regression: the _done write crashed on the
    missing win dir) and later windows must still dedup against it."""
    from marc2rdf_ray.pipelines.corpus import (
        CorpusConfig,
        sync_corpus_windows,
    )

    cfg = CorpusConfig(num_partitions=2, pack_budget=100)
    _write(str(tmp_path / "win" / "w000"), [(i, _doc(i)) for i in range(5)])
    _write(str(tmp_path / "win" / "w001"),
           [(10 + i, _doc(i)) for i in range(5)])  # pure dup window
    m = sync_corpus_windows(str(tmp_path / "win"), str(tmp_path / "o"), cfg)
    assert {r[0] for r in _rows(str(tmp_path / "o"))} <= set(range(5))
    _write(str(tmp_path / "win" / "w002"),
           [(20, _doc(2)), (21, _doc(99))])  # dup of w000 + one new doc
    m2 = sync_corpus_windows(str(tmp_path / "win"), str(tmp_path / "o"), cfg)
    ids = {r[0] for r in _rows(str(tmp_path / "o"))}
    assert 20 not in ids and 21 in ids
    assert m2.triple_count == len(ids)
