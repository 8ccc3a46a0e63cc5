"""Driver-contract query implementations (__ray_entry__.py wiring).

One callable per implemented operator family from SURVEY.md §2, each taking
``sf_dir`` and returning a Dataset / pyarrow Table, with a matching DuckDB
oracle in ORACLE_SQL where the semantics are ANSI-SQL-expressible.

Determinism rules used throughout (driver hashes values order-insensitively
but exactly):
- float aggregates are computed on integer cents (ROUND(x*100) AS BIGINT),
  never on accumulated doubles -- bit-exact across engines;
- similarity scores are computed in float64 and rounded to 4 decimals;
- group representatives are minima, never "first".
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import PipelineConfig
from .model import Field, Record
from .rules import RuleEngine, RuleSet

DOC_BASE = "http://data.example.org/doc/"

# rule set for the documents table (exercises uri/literal/integer datatypes,
# prefix minting, regex tag keys incl. a deliberate duplicate emission)
DOC_MAPPING = {
    "tags": {
        "id": {
            "r": {"predicate": "DC.identifier", "object": {"datatype": "literal"}}
        },
        "lang": {
            "r": {
                "predicate": "DC.language",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://lexvo.org/id/iso639-3/",
                },
            }
        },
        # regex key ALSO matching 'lang' -> duplicate triples (dedup fodder,
        # converter duplicate-preservation semantics; SURVEY.md §2.7 O3)
        "^la": {
            "r": {
                "predicate": "DC.language",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://lexvo.org/id/iso639-3/",
                },
            }
        },
        "meta": {
            "subfield": {
                "s": {
                    "predicate": "DC.source",
                    "object": {
                        "datatype": "uri",
                        "prefix": "http://data.example.org/source/",
                    },
                },
                "c": {
                    "predicate": "DEICH.nChars",
                    "object": {"datatype": "integer"},
                },
            }
        },
    }
}


def _doc_engine() -> RuleEngine:
    return RuleEngine(
        RuleSet(DOC_MAPPING),
        base=DOC_BASE,
        prefix="",
        identifier_tag="id",
        resource_type="FOAF.Document",
    )


class DocsToTriples:
    """documents batch -> triples (the doc-table record lowering)."""

    def __init__(self):
        self.engine = _doc_engine()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        sources = batch["source"].to_pylist()
        nchars = batch["n_chars"].to_pylist()
        subj, pred, obj, kind = [], [], [], []
        for i, lang, src, nc in zip(ids, langs, sources, nchars):
            rec = Record(
                fields=[
                    Field(tag="id", value=str(i)),
                    Field(tag="lang", value=lang),
                    Field(tag="meta", subfields=[("s", src), ("c", str(nc))]),
                ],
                record_id=str(i),
            )
            for t in self.engine.convert(rec):
                subj.append(t[0])
                pred.append(t[1])
                obj.append(t[2])
                kind.append(t[3])
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "obj_kind": pa.array(kind, pa.string()),
            }
        )


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# -- KG queries ------------------------------------------------------------

def kg_triples(sf_dir: str):
    return _read(sf_dir, "documents").map_batches(
        DocsToTriples, batch_format="pyarrow", concurrency=2
    )


def kg_dedup_edges(sf_dir: str):
    from .stages.canonicalize import dedup_triples

    return dedup_triples(
        kg_triples(sf_dir), columns=["subj", "pred", "obj", "obj_kind"]
    )


def _augmented_doc_hashes(sf_dir: str):
    """documents plus exact copies at doc_id+1000000, lowered to
    (subj, content-hash) triples -- deterministic dup clusters."""
    import ray.data as rd

    def to_hash_triples(batch: pa.Table, shift: int) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        subj = [f"{DOC_BASE}{i + shift}" for i in ids]
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        n = len(subj)
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(["hash"] * n, pa.string()),
                "obj": pa.array(h, pa.string()),
                "obj_kind": pa.array(["literal"] * n, pa.string()),
                "lang": pa.array([None] * n, pa.string()),
                "src": pa.array(subj, pa.string()),
            }
        )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    a = docs.map_batches(lambda b: to_hash_triples(b, 0), batch_format="pyarrow")
    b = docs.map_batches(
        lambda b: to_hash_triples(b, 1000000), batch_format="pyarrow"
    )
    return a.union(b)


def kg_sameas_docs(sf_dir: str):
    from .stages.canonicalize import sameas_by_shared_key

    edges = sameas_by_shared_key(_augmented_doc_hashes(sf_dir), "hash")
    return edges.map_batches(
        lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"
    )


# -- relational operator coverage -----------------------------------------

def q1_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(batch["l_extendedprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="cnt"),
        )
    )


def revenue_by_segment(sf_dir: str):
    """Broadcast hash join (small customer side) + pre-aggregated groupby."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    seg_map = dict(
        zip(
            cust.to_pandas()["c_custkey"].tolist(),
            cust.to_pandas()["c_mktsegment"].tolist(),
        )
    )
    ref = ray.put(seg_map)

    class JoinSeg:
        def __init__(self):
            self.seg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_pylist()
            segs = [self.seg.get(k, "UNKNOWN") for k in keys]
            t = pa.table(
                {
                    "c_mktsegment": pa.array(segs, pa.string()),
                    "price_cents": pc.cast(
                        pc.round(pc.multiply(batch["o_totalprice"], 100.0)),
                        pa.int64(),
                    ),
                }
            )
            # partial combine before the shuffle
            return t.group_by(["c_mktsegment"], use_threads=False).aggregate(
                [("price_cents", "sum"), ("price_cents", "count")]
            ).rename_columns(["c_mktsegment", "price_cents", "cnt"])

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = orders.map_batches(JoinSeg, batch_format="pyarrow", concurrency=2)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("price_cents", alias_name="revenue_cents"),
        Sum("cnt", alias_name="num_orders"),
    )


def customers_without_big_orders(sf_dir: str):
    """Anti-join via broadcast key set (SURVEY.md §2.5 J2)."""
    import ray

    big = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    keys = set(
        big.map_batches(
            lambda b: b.filter(pc.greater(b["o_totalprice"], 400000.0)).select(
                ["o_custkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["o_custkey"]
        .tolist()
    )
    ref = ray.put(keys)

    class AntiJoin:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [k not in self.keys for k in batch["c_custkey"].to_pylist()]
            )
            return batch.filter(mask).select(["c_custkey"])

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    return cust.map_batches(AntiJoin, batch_format="pyarrow", concurrency=2)


def top_orders_by_price(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "price_cents": pc.cast(
                    pc.round(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(cents, batch_format="pyarrow")
        .sort(["price_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


# -- events (stream-shaped) ------------------------------------------------

def events_hourly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def window(batch: pa.Table) -> pa.Table:
        epoch_us = pc.cast(batch["ts"], pa.int64())
        # FLOOR division (pc.divide truncates toward zero): for pre-1970
        # timestamps truncation is one bucket off vs the oracle's
        # floor(epoch/3600) -- subtract the positive remainder first.
        h = pa.scalar(3_600_000_000, pa.int64())
        rem0 = pc.subtract(epoch_us, pc.multiply(pc.divide(epoch_us, h), h))
        shifted = pc.add(rem0, h)  # in (0, 2h): trunc == floor here
        rem = pc.subtract(shifted, pc.multiply(pc.divide(shifted, h), h))
        hour = pc.divide(pc.subtract(epoch_us, rem), h)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour": pc.cast(hour, pa.int64()),
                "value_cents": pc.cast(
                    pc.round(pc.multiply(batch["value"], 100.0)), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(
            Count(alias_name="cnt"), Sum("value_cents", alias_name="sum_value_cents")
        )
    )


def events_top_types(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["event_type"])
    return (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="cnt"))
        .sort(["cnt", "event_type"], descending=[True, False])
        .limit(5)
    )


def events_json_props(sf_dir: str):
    """JSON-ish projection: extract the numeric prop, aggregate per type."""
    import re

    from ray.data.aggregate import Sum

    num = re.compile(r"[0-9]+")
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        ks = [
            int(m.group(0)) if (m := num.search(p or "")) else 0
            for p in batch["props"].to_pylist()
        ]
        return pa.table(
            {"event_type": batch["event_type"], "k": pa.array(ks, pa.int64())}
        )

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"))
    )


# -- text ops --------------------------------------------------------------

def docs_token_stats(sf_dir: str):
    from .ops.textstats import token_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: token_stats_batch(b).select(["doc_id", "ws_tokens", "n_chars"]),
        batch_format="pyarrow",
    )


def docs_lang_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="cnt"))


def docs_quality(sf_dir: str):
    from .ops.textstats import quality_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def docs_langid(sf_dir: str):
    from .ops.textstats import langid_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(langid_batch, batch_format="pyarrow")


def docs_fingerprint(sf_dir: str):
    from .ops.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# -- dedup family ----------------------------------------------------------

def _augmented_docs(sf_dir: str, perturb: bool):
    """documents ∪ copies at +1000000 (exact, or lightly perturbed for
    near-dup ops: last word dropped)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shift(batch: pa.Table) -> pa.Table:
        ids = [i + 1000000 for i in batch["doc_id"].to_pylist()]
        texts = batch["text"].to_pylist()
        if perturb:
            texts = [" ".join((t or "").split()[:-1]) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return docs.union(docs.map_batches(shift, batch_format="pyarrow"))


def dedup_exact(sf_dir: str):
    from .ops.dedup import exact_dedup_groups

    return exact_dedup_groups(_augmented_docs(sf_dir, perturb=False))


def dedup_minhash(sf_dir: str):
    from .ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _augmented_docs(sf_dir, perturb=True), threshold=0.7
    )


def dedup_simhash(sf_dir: str):
    from .ops.dedup import simhash_pairs

    return simhash_pairs(_augmented_docs(sf_dir, perturb=True), max_hamming=3)


def dedup_embedding(sf_dir: str):
    from .ops.dedup import embedding_dup_pairs

    import ray.data as rd

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def noisy(batch: pa.Table) -> pa.Table:
        ids = [i + 1000000 for i in batch["vec_id"].to_pylist()]
        mats = np.array(batch["embedding"].to_pylist(), dtype=np.float32)
        rng = np.random.RandomState(7)
        mats = mats + rng.randn(*mats.shape).astype(np.float32) * 0.01
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, m)) for m in mats], pa.list_(pa.float32())
                ),
            }
        )

    aug = emb.union(emb.map_batches(noisy, batch_format="pyarrow"))
    return embedding_dup_pairs(aug, threshold=0.98)


# -- similarity search -----------------------------------------------------

def _query_vectors(sf_dir: str, n: int = 8):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = pc.less(t["vec_id"], n)
    t = t.filter(mask)
    ids = t["vec_id"].to_pylist()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def ann_brute_topk(sf_dir: str):
    from .ops.ann import brute_topk

    ids, mat = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return brute_topk(emb, ids, mat, k=10)


def ann_lsh_topk(sf_dir: str):
    from .ops.ann import lsh_topk

    ids, mat = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(emb, ids, mat, k=10)


def embeddings_by_label(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "embeddings", columns=["label"])
    return ds.groupby("label").aggregate(Count(alias_name="cnt"))


# -- compatibility + multimodal (rows-only) --------------------------------

def marc_fixture_convert(sf_dir: str):
    """Convert the reference's own MARCXML fixture corpus with its skeleton
    mapping (sf_dir-independent conformance path)."""
    import json

    from .sources.marcxml import read_marcxml

    rs = RuleSet(
        json.load(open("/root/reference/config/templates/mapping_skeleton.json"))
    )
    eng = RuleEngine(
        rs,
        base="http://data.deichman.no/resource/",
        prefix="tnr_",
        identifier_tag="001",
        resource_type="BIBO.Document",
    )
    rows = []
    for rec in read_marcxml("/root/reference/spec/example.normarc.xml"):
        for t in eng.convert(rec):
            rows.append(
                {"subj": t[0], "pred": t[1], "obj": t[2], "obj_kind": t[3]}
            )
    return pa.Table.from_pylist(rows)


def multimodal_decode(sf_dir: str):
    import ray.data as rd

    from .ops.multimodal import DecodeStub, synth_media_table

    ds = rd.from_arrow(synth_media_table(200))
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )


def kg_flagship_edges(sf_dir: str):
    """The flagship pipeline end-to-end over a synthesized pages corpus
    (rows-only: page synthesis is not expressible over the SQL views)."""
    import tempfile

    import ray.data as rd

    from .pipelines.kg import run_kg_pipeline
    from .sources.pages import synthesize_pages

    with tempfile.TemporaryDirectory() as tmp:
        import os

        import pyarrow.parquet as pq

        pdir = os.path.join(tmp, "pages")
        os.makedirs(pdir)
        pq.write_table(synthesize_pages(200, seed=42), f"{pdir}/pages.parquet")
        out = os.path.join(tmp, "graph")
        run_kg_pipeline(pdir, out, PipelineConfig())
        parts = sorted(
            os.path.join(out, d, "edges.parquet")
            for d in os.listdir(out)
            if d.startswith("part=")
        )
        return pa.concat_tables([pq.read_table(p) for p in parts])


def reverse_records(sf_dir: str):
    """M20 reverse conversion: edges -> field records, flattened to
    (subj, tag) rows for the oracle."""
    import pyarrow as pa

    from .stages.reverse import invert_mapping, records_from_edges
    from .vocab import DEFAULT_VOCAB

    inv = invert_mapping(DOC_MAPPING, DEFAULT_VOCAB)
    recs = records_from_edges(kg_triples(sf_dir), inv)

    def flatten(b: pa.Table) -> pa.Table:
        subj, tag = [], []
        for s_, fields in zip(b["subj"].to_pylist(), b["fields"].to_pylist()):
            for f in fields or []:
                subj.append(s_)
                tag.append(f["tag"])
        return pa.table(
            {"subj": pa.array(subj, pa.string()), "tag": pa.array(tag, pa.string())}
        )

    return recs.map_batches(flatten, batch_format="pyarrow")


def distinct_flag_ship_months(sf_dir: str):
    """Salted two-phase distinct (hot-key-safe groupby) over lineitem:
    distinct (l_returnflag, ship month)."""
    from .stages.canonicalize import salted_group_distinct

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_shipdate"])

    def month(batch: pa.Table) -> pa.Table:
        epoch_us = pc.cast(batch["l_shipdate"], pa.int64())
        # month bucket: days since epoch // 30 is NOT calendar month; use
        # strftime for an exact calendar key
        m = pc.strftime(batch["l_shipdate"], format="%Y-%m")
        return pa.table({"l_returnflag": batch["l_returnflag"], "ship_month": m})

    out = salted_group_distinct(
        ds.map_batches(month, batch_format="pyarrow"),
        ["l_returnflag"],
        "ship_month",
        salt=8,
    )
    return out.map_batches(
        lambda b: b.select(["l_returnflag", "ship_month"]), batch_format="pyarrow"
    )


def doc_components(sf_dir: str):
    """Connected components (bounded min-label propagation) over the
    duplicate-document sameAs graph; star clusters -> root = min subject."""
    from .stages.canonicalize import connected_components, sameas_by_shared_key

    edges = sameas_by_shared_key(_augmented_doc_hashes(sf_dir), "hash")
    return connected_components(edges, rounds=3)


def top_orders_per_segment(sf_dir: str):
    """Per-group top-k: 3 priciest orders per market segment."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cdf = cust.to_pandas()
    seg_map = dict(zip(cdf["c_custkey"].tolist(), cdf["c_mktsegment"].tolist()))
    ref = ray.put(seg_map)

    class JoinSeg:
        def __init__(self):
            self.seg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            segs = [self.seg.get(k, "UNKNOWN")
                    for k in batch["o_custkey"].to_pylist()]
            return pa.table(
                {
                    "c_mktsegment": pa.array(segs, pa.string()),
                    "o_orderkey": batch["o_orderkey"],
                    "price_cents": pc.cast(
                        pc.round(pc.multiply(batch["o_totalprice"], 100.0)),
                        pa.int64(),
                    ),
                }
            )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(group: pa.Table) -> pa.Table:
        return group.sort_by(
            [("price_cents", "descending"), ("o_orderkey", "ascending")]
        ).slice(0, 3)

    return (
        orders.map_batches(JoinSeg, batch_format="pyarrow", concurrency=2)
        .groupby("c_mktsegment")
        .map_groups(topk, batch_format="pyarrow")
    )


def similar_docs(sf_dir: str):
    """J5-analog similarity pairs: documents sharing (lang, source)."""
    from .stages.canonicalize import similarity_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    out = similarity_pairs(ds, ["lang", "source"], "doc_id")
    return out.map_batches(lambda b: b.select(["a", "b"]), batch_format="pyarrow")


def count_distinct_subjects(sf_dir: str):
    """A2: COUNT(DISTINCT ?s) -- unique subjects of the doc triples."""
    ds = kg_triples(sf_dir)
    uniq = ds.map_batches(
        lambda b: pa.table({"subj": pc.unique(b["subj"].combine_chunks())}),
        batch_format="pyarrow",
    ).groupby("subj").count()
    n = uniq.count()
    return pa.table({"n_subjects": pa.array([n], pa.int64())})


def docs_enriched_labels(sf_dir: str):
    """J1 enrichment: broadcast authority table (embeddings labels keyed by
    id) attaches cluster labels to matching doc subjects."""
    from .stages.enrich import enrich_triples

    import pyarrow.parquet as pq

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    authority = {
        str(v): {"http://data.example.org/def/clusterLabel": (str(l), "literal")}
        for v, l in zip(emb["vec_id"].to_pylist(), emb["label"].to_pylist())
    }
    enriched = enrich_triples(
        kg_triples(sf_dir).map_batches(
            lambda b: b.append_column(
                "lang", pa.nulls(len(b), pa.string())
            ).append_column("src", b["subj"]),
            batch_format="pyarrow",
        ),
        authority,
        "http://purl.org/dc/terms/identifier",
    )
    return enriched.map_batches(
        lambda b: b.select(["subj", "pred", "obj"]), batch_format="pyarrow"
    )


def docs_without_blocked_content(sf_dir: str):
    """O4 content-checksum blocklist: drop docs whose md5(text) matches the
    blocklist (derived here from doc_id < 3)."""
    import hashlib

    import pyarrow.parquet as pq

    from .stages.enrich import filter_content_blocklist

    head = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).filter(pc.less(pc.field("doc_id"), 3))
    blocked = {
        hashlib.md5(t.encode()).hexdigest() for t in head["text"].to_pylist()
    }
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = filter_content_blocklist(ds, "text", blocked)
    return out.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")


# -- registry --------------------------------------------------------------

QUERIES = {
    "kg_triples": kg_triples,
    "kg_dedup_edges": kg_dedup_edges,
    "kg_sameas_docs": kg_sameas_docs,
    "kg_flagship_edges": kg_flagship_edges,
    "q1_pricing_summary": q1_pricing_summary,
    "revenue_by_segment": revenue_by_segment,
    "customers_without_big_orders": customers_without_big_orders,
    "top_orders_by_price": top_orders_by_price,
    "events_hourly": events_hourly,
    "events_top_types": events_top_types,
    "events_json_props": events_json_props,
    "docs_token_stats": docs_token_stats,
    "docs_lang_histogram": docs_lang_histogram,
    "docs_quality": docs_quality,
    "docs_langid": docs_langid,
    "docs_fingerprint": docs_fingerprint,
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "ann_brute_topk": ann_brute_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embeddings_by_label": embeddings_by_label,
    "reverse_records": reverse_records,
    "distinct_flag_ship_months": distinct_flag_ship_months,
    "doc_components": doc_components,
    "top_orders_per_segment": top_orders_per_segment,
    "similar_docs": similar_docs,
    "docs_enriched_labels": docs_enriched_labels,
    "docs_without_blocked_content": docs_without_blocked_content,
    "count_distinct_subjects": count_distinct_subjects,
    "marc_fixture_convert": marc_fixture_convert,
    "multimodal_decode": multimodal_decode,
}

_KG_TRIPLES_SQL = f"""
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR) AS subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       'http://xmlns.com/foaf/0.1/Document' AS obj, 'uri' AS obj_kind
FROM documents
UNION ALL
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR),
       'http://purl.org/dc/terms/identifier', CAST(doc_id AS VARCHAR), 'literal'
FROM documents
UNION ALL
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR),
       'http://purl.org/dc/terms/language',
       'http://lexvo.org/id/iso639-3/' || lang, 'uri'
FROM documents
UNION ALL
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR),
       'http://purl.org/dc/terms/language',
       'http://lexvo.org/id/iso639-3/' || lang, 'uri'
FROM documents
UNION ALL
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR),
       'http://purl.org/dc/terms/source',
       'http://data.example.org/source/' || source, 'uri'
FROM documents
UNION ALL
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR),
       'http://data.deichman.no/nChars', CAST(n_chars AS VARCHAR), 'integer'
FROM documents
"""

ORACLE_SQL = {
    "kg_triples": _KG_TRIPLES_SQL,
    "kg_dedup_edges": f"SELECT DISTINCT * FROM ({_KG_TRIPLES_SQL})",
    "kg_sameas_docs": """
WITH aug AS (
  SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR) AS subj,
         md5(text) AS h FROM documents
  UNION ALL
  SELECT 'http://data.example.org/doc/' || CAST(doc_id + 1000000 AS VARCHAR),
         md5(text) FROM documents
), m AS (SELECT h, min(subj) AS canon FROM aug GROUP BY h)
SELECT a.subj AS subj, m.canon AS obj
FROM aug a JOIN m ON a.h = m.h WHERE a.subj > m.canon
""",
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "revenue_by_segment": """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS num_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    "customers_without_big_orders": """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
""",
    "top_orders_by_price": """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 10
""",
    "events_hourly": """
SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id, hour
""",
    "events_top_types": """
SELECT event_type, COUNT(*) AS cnt FROM events
GROUP BY event_type ORDER BY cnt DESC, event_type ASC LIMIT 5
""",
    "events_json_props": """
SELECT event_type,
       CAST(SUM(CAST(COALESCE(regexp_extract(props, '[0-9]+'), '0') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
""",
    "docs_token_stats": r"""
SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
    "docs_lang_histogram": "SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang",
    "dedup_exact": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents)
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id, COUNT(*) AS cnt
FROM aug GROUP BY md5(text)
""",
    "embeddings_by_label": "SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label",
    "distinct_flag_ship_months": """
SELECT DISTINCT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ship_month
FROM lineitem
""",
    "doc_components": """
WITH aug AS (
  SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR) AS subj,
         md5(text) AS h FROM documents
  UNION ALL
  SELECT 'http://data.example.org/doc/' || CAST(doc_id + 1000000 AS VARCHAR),
         md5(text) FROM documents
), m AS (SELECT h, min(subj) AS canon, count(*) AS n FROM aug GROUP BY h)
SELECT a.subj AS node, m.canon AS root
FROM aug a JOIN m ON a.h = m.h WHERE m.n > 1
""",
    "docs_enriched_labels": """
SELECT 'http://data.example.org/doc/' || CAST(d.doc_id AS VARCHAR) AS subj,
       'http://data.example.org/def/clusterLabel' AS pred,
       CAST(e.label AS VARCHAR) AS obj
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    "docs_without_blocked_content": """
SELECT doc_id FROM documents
WHERE md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 3)
""",
    "similar_docs": """
SELECT a.doc_id AS a, b.doc_id AS b
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
""",
    "count_distinct_subjects": """
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_subjects FROM documents
""",
    "top_orders_per_segment": """
SELECT c.c_mktsegment, o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY row_number() OVER (
  PARTITION BY c.c_mktsegment
  ORDER BY price_cents DESC, o.o_orderkey ASC) <= 3
""",
    "reverse_records": """
SELECT 'http://data.example.org/doc/' || CAST(doc_id AS VARCHAR) AS subj,
       t.tag
FROM documents CROSS JOIN (VALUES ('id'), ('lang'), ('meta')) AS t(tag)
""",
    "ann_brute_topk": """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 8)
SELECT q.qid, e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS score
FROM embeddings e CROSS JOIN q
QUALIFY row_number() OVER (
  PARTITION BY q.qid
  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
           e.vec_id ASC) <= 10
""",
}
