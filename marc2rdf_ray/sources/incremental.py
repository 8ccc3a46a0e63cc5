"""Incremental (time-windowed) page source.

Analog of the reference's OAI-PMH windowed harvest: ``list_records(from,
until)`` with resumption-token paging and daily cron re-harvest
(/root/reference/lib/oaiclient.rb:28-109, scheduler.rb:212-273, 327-350).

Ray Data reformulation: the pages table is partitioned by crawl time
(``warc_ts``); an incremental run filters the window AT THE READ (parquet
row-group statistics prune untouched files) and flows through the same
pipeline; re-running a window recomputes its output partitions via the
lineage manifests (stages/materialize.py) instead of delete+re-insert
(sparql_update.rb:17-21).
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional


def _to_ts(x) -> Optional[_dt.datetime]:
    if x is None:
        return None
    if isinstance(x, _dt.datetime):
        return x
    if isinstance(x, _dt.date):
        return _dt.datetime(x.year, x.month, x.day)
    return _dt.datetime.fromisoformat(str(x))


def read_pages_window(
    path: str,
    since=None,
    until=None,
    columns: Optional[list[str]] = None,
):
    """read_parquet with a ``warc_ts`` window pushed into the scan.

    Default window = yesterday -> today when both bounds are None with
    ``default_daily=True`` semantics left to the caller (the reference
    defaults from=yesterday, until=today, oaiclient.rb:29-30).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    since_ts, until_ts = _to_ts(since), _to_ts(until)
    flt = None
    if since_ts is not None:
        flt = pc.field("warc_ts") >= pc.scalar(since_ts)
    if until_ts is not None:
        upper = pc.field("warc_ts") < pc.scalar(until_ts)
        flt = upper if flt is None else (flt & upper)
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if flt is not None:
        kwargs["filter"] = flt  # row-group pushdown (prune at the read)
    return rd.read_parquet(path, **kwargs)


def daily_window(today=None) -> tuple[_dt.datetime, _dt.datetime]:
    """The reference's default harvest window: yesterday -> today."""
    today = _to_ts(today) or _dt.datetime.now()
    start = _dt.datetime(today.year, today.month, today.day) - _dt.timedelta(days=1)
    return start, start + _dt.timedelta(days=1)
