"""SPARQL-style basic-graph-pattern matching over a triple Dataset.

The reference materializes its converted graph into a SPARQL store and
queries it with graph patterns (sparql_update.rb issues pattern-shaped
DELETE/INSERT/SELECT blocks; rdfmodeler.rb:314-324 writes the triples the
patterns run against).  This module is the Ray-Data-native analog: the
edge table IS the store, and a star-shaped BGP (k patterns sharing one
subject variable) executes as ONE hash-bucket shuffle on the subject
followed by in-task Arrow hash joins -- the connected-components exchange
discipline (stages/canonicalize.py) applied to query answering.

Scale notes
-----------
- The triple stream is slimmed to (subj, pattern-index, obj) BEFORE the
  exchange: rows whose predicate matches no pattern never shuffle, and the
  predicate string itself never crosses the wire (an int8 index does).
- RDF graphs are triple SETS; converter output may carry duplicate
  emissions (rules.py duplicate-rule semantics), so bindings are computed
  on the per-bucket DISTINCT (subj, pi, obj) set -- SPARQL set semantics
  over a set graph, and the dedup happens bucket-locally after the
  shuffle (no global dedup pass needed).
- One bucket's bindings fit one task: buckets are md5-spread subjects
  (functions/hashing.bucket_codes), so a bucket holds |subjects|/B
  subjects regardless of skew in any one subject's triple count; the
  per-subject fan-out of a star join is the product of its per-pattern
  value counts, which for functional-ish predicates is O(1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import bucket_codes


def _num_buckets_default() -> int:
    try:
        import ray

        return max(4, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:  # pragma: no cover
        return 8


def bgp_star_match(
    triples_ds,
    patterns,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    num_buckets: int | None = None,
):
    """Match a star BGP ``?s <p_i> ?v_i`` for every ``(p_i, v_i)`` in
    ``patterns`` (ordered list of ``(pred_uri, var_name)``) and return a
    Dataset of bindings: one ``subj`` column plus one column per variable.

    Duplicate predicates for one subject (multi-valued properties) yield
    the full cross product of bindings, exactly as SPARQL joins do.
    """
    if not patterns:
        raise ValueError("bgp_star_match needs at least one pattern")
    names = [v for _, v in patterns]
    if len(set(names)) != len(names):
        raise ValueError("pattern variable names must be distinct")
    preds = pa.array([p for p, _ in patterns], pa.string())
    nb = num_buckets or _num_buckets_default()

    def slim(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b[pred_col], value_set=preds)
        hit = pc.is_valid(idx)
        t = pa.table(
            {
                "subj": b[subj_col].filter(hit),
                "pi": pc.cast(idx.filter(hit), pa.int8()),
                "obj": b[obj_col].filter(hit),
            }
        )
        return t.append_column("_cb", bucket_codes(t["subj"], nb))

    out_fields = [pa.field("subj", pa.string())] + [
        pa.field(v, pa.string()) for v in names
    ]
    out_schema = pa.schema(out_fields)

    def assemble(group: pa.Table) -> pa.Table:
        # SPARQL set semantics over the (deduplicated) triple set
        g = (
            group.select(["subj", "pi", "obj"])
            .group_by(["subj", "pi", "obj"], use_threads=False)
            .aggregate([])
        )
        tab = None
        for i, v in enumerate(names):
            side = g.filter(pc.equal(g["pi"], pa.scalar(i, pa.int8())))
            side = pa.table({"subj": side["subj"], v: side["obj"]})
            if tab is None:
                tab = side
            else:
                tab = tab.join(side, keys="subj", join_type="inner",
                               use_threads=False)
            if tab.num_rows == 0:
                return out_schema.empty_table()
        return tab.select(out_schema.names).cast(out_schema)

    return (
        triples_ds.map_batches(slim, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(assemble, batch_format="pyarrow")
    )


def predicate_stats(
    triples_ds,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """VoID-style per-predicate dataset statistics over a triple Dataset:
    triple count, distinct subjects and distinct objects per predicate --
    computed on the DISTINCT triple set (RDF set semantics), in ONE
    logical pass.

    Scale shape: each triple lowers to three slim (pred, role, val) rows
    (val = subject, object, or the md5 of the full triple for the count
    role); per-batch local dedup collapses repeats before ONE global
    distinct groupby, and the final (pred, role) -> count pivot is
    O(#preds) driver work.  Raw triples never shuffle; only their
    collapsed role rows do.
    """
    from ray.data.aggregate import Count, Sum

    from ..functions.hashing import hash_strings_u64

    def lower(b: pa.Table) -> pa.Table:
        subj, pred, obj = b[subj_col], b[pred_col], b[obj_col]
        # triple-identity hash so the 't' role counts DISTINCT triples
        th = hash_strings_u64(
            pc.binary_join_element_wise(
                pc.cast(subj, pa.string()),
                pc.cast(pred, pa.string()),
                pc.cast(obj, pa.string()),
                "\x1f",
            )
        )
        tval = pa.array(np.char.mod("%016x", th), pa.string())
        t = pa.table(
            {
                "pred": pa.concat_arrays(
                    [pc.cast(pred, pa.string()).combine_chunks()] * 3
                ),
                "role": pa.array(
                    ["s"] * len(b) + ["o"] * len(b) + ["t"] * len(b),
                    pa.string(),
                ),
                "val": pa.concat_arrays(
                    [
                        pc.cast(subj, pa.string()).combine_chunks(),
                        pc.cast(obj, pa.string()).combine_chunks(),
                        tval,
                    ]
                ),
            }
        )
        # local dedup: repeats within the batch never reach the exchange
        return (
            t.group_by(["pred", "role", "val"], use_threads=False)
            .aggregate([])
        )

    distinct = (
        triples_ds.map_batches(lower, batch_format="pyarrow")
        .groupby(["pred", "role", "val"])
        .aggregate(Count(alias_name="_n"))
    )

    def role_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pred": b["pred"],
                "role": b["role"],
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["pred", "role"], use_threads=False)
            .aggregate([("n", "sum")])
            .rename_columns(["pred", "role", "n"])
        )

    counts = (
        distinct.map_batches(role_partial, batch_format="pyarrow")
        .groupby(["pred", "role"])
        .aggregate(Sum("n", alias_name="n"))
    )

    import ray

    tab = pa.concat_tables(
        ray.get(counts.materialize().to_arrow_refs()),
        promote_options="default",
    )
    preds = pc.unique(tab["pred"].combine_chunks())
    by = {}
    for pred, role, n in zip(
        tab["pred"].to_pylist(), tab["role"].to_pylist(), tab["n"].to_pylist()
    ):
        by[(pred, role)] = int(n)
    plist = sorted(preds.to_pylist())
    return pa.table(
        {
            "pred": pa.array(plist, pa.string()),
            "n_triples": pa.array(
                [by.get((p, "t"), 0) for p in plist], pa.int64()
            ),
            "n_subjects": pa.array(
                [by.get((p, "s"), 0) for p in plist], pa.int64()
            ),
            "n_objects": pa.array(
                [by.get((p, "o"), 0) for p in plist], pa.int64()
            ),
        }
    )
