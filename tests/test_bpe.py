"""BPE train + apply: hand-computed fixtures (the sf-dir contract
queries docs_bpe_train / docs_bpe_tokens carry the DuckDB oracles; this
pins the op semantics on a corpus small enough to verify by hand)."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_hand_computed():
    import ray.data as rd

    from marc2rdf_ray.ops.corpus import bpe_train

    ds = rd.from_items([{"text": "aa ab aa"}, {"text": "ab aa"}])
    got = bpe_train(ds, n_merges=3).to_pylist()
    # vocab {aa:3, ab:2}; pairs (a,a):3 > (a,b):2; after merging (a,a)
    # only (a,b):2 remains; then no pairs -- early stop at 2 merges.
    assert got == [
        {"step": 0, "a": "a", "b": "a", "cnt": 3},
        {"step": 1, "a": "a", "b": "b", "cnt": 2},
    ]


@pytest.mark.usefixtures("ray_session")
def test_bpe_apply_left_to_right_nonoverlap():
    import ray.data as rd

    from marc2rdf_ray.ops.corpus import bpe_token_counts

    ds = rd.from_items(
        [{"doc_id": 1, "text": "aaa ab"}, {"doc_id": 2, "text": ""}]
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(ds, [("a", "a"), ("a", "b")]).take_all()
    }
    # 'aaa' -> [aa, a] (leftmost non-overlapping) = 2; 'ab' -> 1
    assert got == {1: 3, 2: 0}


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_rank_order_feeds_apply():
    """Merges learned by bpe_train apply in rank order: the (a,a) merge
    learned first must win over (a,b) when both touch position 0."""
    import ray.data as rd

    from marc2rdf_ray.ops.corpus import bpe_token_counts, bpe_train

    ds = rd.from_items([{"text": "aa ab aa"}, {"text": "ab aa"}])
    merges = [(r["a"], r["b"]) for r in bpe_train(ds, n_merges=3).to_pylist()]
    apply_ds = rd.from_items([{"doc_id": 1, "text": "aab"}])
    got = bpe_token_counts(apply_ds, merges).take_all()
    # 'aab': (a,a) has lower rank -> [aa, b] = 2 tokens (not [a, ab])
    assert got == [{"doc_id": 1, "n_tokens": 2}]
