"""Web-URL operators: canonicalization, canonical-URL dedup, domain stats.

A web-scale corpus keys on URLs: the reference resolves and normalizes
resource URIs before linking (string_replace.rb urlize; SURVEY.md §2.3
M10/M11 normalize *display strings* into URIs), and crawl pipelines dedup
fetches by canonical URL and budget/filter by registrable domain (CCNet /
C4 practice -- public).  These ops give the engine that surface:

- :func:`canonicalize_urls` -- deterministic, SQL-replayable canonical
  form: drop the fragment, strip tracking params (utm_*, fbclid, gclid,
  ref), re-anchor the query separator, lowercase ONLY the scheme://host
  part (paths stay case-sensitive), collapse ``/?`` and strip trailing
  ``/``/``?``.
- :func:`url_dedup_min_id` -- one row per canonical URL, keeping the
  smallest id (group representative = minimum, the repo-wide determinism
  rule).
- :func:`domain_stats` -- per-host aggregate (docs, chars) for
  domain-budget decisions.

Vectorization note: lowercasing a per-row *prefix* (the authority) has no
pyarrow.compute kernel (no per-row-offset slice), so the canonical form is
computed with polars expressions -- zero-copy from the Arrow batch, Rust
kernels, no Python per row.  The regex subset used (lazy quantifier,
char classes, alternation; no backrefs) behaves identically in polars'
Rust regex and DuckDB's RE2; parity is pinned by tests and the
docs_url_dedup oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRACKING_PARAMS = "utm_[a-z0-9]+|fbclid|gclid|ref"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def _canon_expr(col: str):
    import polars as pl

    t1 = pl.col(col).str.replace(r"#.*$", "")
    t2 = t1.str.replace_all(rf"[?&]({TRACKING_PARAMS})=[^&#]*", "")
    # if the first surviving param lost its '?', promote its '&'
    t3 = t2.str.replace(r"^([^?]*?)&", "${1}?").str.replace(r"/+\?", "?")
    auth = t3.str.extract(rf"({_AUTH_RE})", 1)
    rest = t3.str.replace(_AUTH_RE, "")
    canon = (
        pl.when(auth.is_null())
        .then(t3)  # no scheme://host -> nothing to case-fold
        .otherwise(auth.str.to_lowercase() + rest)
    )
    return canon.str.replace(r"[/?]+$", "")


def canonicalize_urls(ds, *, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append ``out_col`` with the canonical form of ``url_col``
    (stateless map_batches; see module docstring for the exact rules)."""

    def canon(b: pa.Table) -> pa.Table:
        import polars as pl

        u = b[url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        out = (
            pl.DataFrame({"u": pl.Series("u", u)})
            .select(_canon_expr("u").alias("c"))["c"]
            .to_arrow()
        )
        return b.append_column(out_col, pc.cast(out, pa.string()))

    return ds.map_batches(canon, batch_format="pyarrow")


def url_dedup_min_id(ds, *, url_col: str = "url", id_col: str = "doc_id"):
    """One row per canonical URL with the SMALLEST ``id_col`` -- crawl
    dedup where re-fetches of the same canonical page collapse to the
    first fetch.  Two-phase min: per-batch Arrow group_by combiner, then
    one small groupby over (hash-collapsed) partials; shuffle volume is
    O(distinct canonical URLs per batch), never O(rows).

    Returns ``(id_col, canonical_url)``.
    """
    from ray.data.aggregate import Min

    canon = canonicalize_urls(ds, url_col=url_col)

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({
                "canonical_url": b["canonical_url"],
                id_col: pc.cast(b[id_col], pa.int64()),
            })
            .group_by(["canonical_url"], use_threads=False)
            .aggregate([(id_col, "min")])
        )
        return g.rename_columns(["canonical_url", "__mid"])

    out = (
        canon.map_batches(partial, batch_format="pyarrow")
        .groupby("canonical_url")
        .aggregate(Min("__mid"))
    )
    return out.map_batches(
        lambda b: pa.table({
            id_col: b["min(__mid)"],
            "canonical_url": b["canonical_url"],
        }),
        batch_format="pyarrow",
    )


def domain_stats(ds, *, url_col: str = "url", chars_col: str | None = None):
    """Per-domain corpus footprint: ``(domain, n_docs, sum_chars)`` where
    domain = lowercased host with any ``:port`` and leading ``www.``
    stripped ('' when the value has no scheme://host).  Per-batch Arrow
    group_by combiner then one small groupby -- the domain-budget /
    per-site-cap primitive of crawl curation.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        u = b[url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        host = (
            pl.col("u").str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
            .str.to_lowercase()
            .str.replace(r":[0-9]+$", "")
            .str.replace(r"^www\.", "")
        )
        dom = (
            pl.DataFrame({"u": pl.Series("u", u)})
            .select(host.fill_null("").alias("d"))["d"]
            .to_arrow()
        )
        t = pa.table({
            "domain": pc.cast(dom, pa.string()),
            "__n": pa.array([1] * len(b), pa.int64()),
            "__c": (
                pc.cast(b[chars_col], pa.int64())
                if chars_col is not None
                else pa.array([0] * len(b), pa.int64())
            ),
        })
        return (
            t.group_by(["domain"], use_threads=False)
            .aggregate([("__n", "sum"), ("__c", "sum")])
            .rename_columns(["domain", "__n", "__c"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("__n"), Sum("__c"))
    )
    return out.map_batches(
        lambda b: pa.table({
            "domain": b["domain"],
            "n_docs": b["sum(__n)"],
            "sum_chars": b["sum(__c)"],
        }),
        batch_format="pyarrow",
    )
