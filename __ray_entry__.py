"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on a deterministic
synthetic pages corpus sized like sf0.001 and returns the canonical edge
table.  ``queries()``/``oracle_sql()`` expose one entry per implemented
operator family (SURVEY.md §2) over the /root/testdata tables; see
marc2rdf_ray/entry_queries.py for the implementations and determinism rules.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from marc2rdf_ray.entry_queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on a deterministic synthetic corpus (~sf0.001)."""
    from marc2rdf_ray.entry_queries import kg_flagship_edges

    return kg_flagship_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from marc2rdf_ray.entry_queries import flagship_edges_oracle_sql

    out = dict(ORACLE_SQL)
    # built lazily: the SQL embeds the deterministic pages-fixture path and
    # creating the fixture at import time would be a side effect
    out["kg_flagship_edges"] = flagship_edges_oracle_sql()
    return out
