"""Concrete HTTP pull driver for the S6 sync framework (SURVEY §2.1).

The reference's pull drivers fetch a collection's objects for one
TimeInterval from a paginated SaaS API — e.g. the Google Analytics
driver pages ReportRequests with pageToken/pageSize inside
``GetObjectsFor(interval)`` (server/drivers/google_analytics.go:109-148)
and the task executor replays NEW/REFRESH intervals through it. This
module implements that contract against a generic offset-paginated
JSON-over-HTTP endpoint:

    GET {base_url}{path}?start=<iso>&end=<iso>&offset=<n>&limit=<m>
    -> {"rows": [ {...}, ... ], "total": <int>}

Ray-first shape: page 0 is fetched driver-side to learn ``total``; the
remaining pages fan out as Ray tasks (each returns its page as an Arrow
table ref) and the interval's Dataset is assembled with
``from_arrow_refs`` — rows never pass through the driver. Pagination by
offset is what makes the fan-out legal; a cursor/token API degrades to
a sequential walk inside one task (intervals still sync in parallel
across collections). Plug an instance's ``objects_for`` into
``pipelines.sync.Collection.loader`` and the signature store handles
NEW/REFRESH/UPTODATE planning.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Callable

import pyarrow as pa
import ray
import ray.data

from ..state.signatures import TimeInterval


def _fetch_json(url: str, headers: dict | None = None, timeout: float = 30.0) -> dict:
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


@ray.remote(num_cpus=0)
def _fetch_page_task(url: str, headers: dict | None, to_table_ref) -> pa.Table:
    """One page fetch as a zero-cpu task: the work is network wait, not
    compute — a full CPU slot per in-flight request would starve the
    transform stages consuming the synced Dataset."""
    rows = _fetch_json(url, headers).get("rows", [])
    return to_table_ref(rows)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows)


class HttpPullSource:
    """Offset-paginated JSON HTTP source, one instance per collection
    endpoint. ``to_table`` converts a page's row dicts to an Arrow table
    (pass an explicit-schema converter for type stability when a page
    could be all-null in some column)."""

    def __init__(
        self,
        base_url: str,
        path: str,
        page_size: int = 500,
        params: dict | None = None,
        headers: dict | None = None,
        to_table: Callable[[list[dict]], pa.Table] = _rows_to_table,
        max_parallel_pages: int = 16,
    ):
        self.base_url = base_url.rstrip("/")
        self.path = path
        self.page_size = page_size
        self.params = dict(params or {})
        self.headers = dict(headers or {})
        self.to_table = to_table
        self.max_parallel_pages = max_parallel_pages

    def _page_url(self, interval: TimeInterval, offset: int) -> str:
        q = dict(self.params)
        if not interval.is_all():
            q["start"] = interval.time.isoformat()
            q["end"] = interval.upper_endpoint().isoformat()
        q["offset"] = str(offset)
        q["limit"] = str(self.page_size)
        return f"{self.base_url}{self.path}?{urllib.parse.urlencode(q)}"

    def objects_for(self, interval: TimeInterval) -> "ray.data.Dataset":
        """GetObjectsFor analog: the interval's rows as a Dataset.

        Page 0 driver-side; when the endpoint reports ``total`` the
        remaining offsets fan out as Ray tasks — at most
        ``max_parallel_pages`` in flight (ray.wait throttle; the tasks
        are zero-cpu so nothing else bounds concurrent GETs against a
        rate-limited API). Without ``total`` the offsets aren't knowable
        up front, so pages are walked sequentially until a short page —
        never silently truncated to page 0."""
        first = _fetch_json(self._page_url(interval, 0), self.headers)
        first_rows = first.get("rows", [])
        first_tbl = self.to_table(first_rows)
        if "total" not in first:
            return self._walk_pages(interval, first_tbl, len(first_rows))
        total = int(first["total"])
        offsets = list(range(self.page_size, total, self.page_size))
        refs: list = []
        in_flight: list = []
        for off in offsets:
            if len(in_flight) >= self.max_parallel_pages:
                done, in_flight = ray.wait(in_flight, num_returns=1)
            r = _fetch_page_task.remote(
                self._page_url(interval, off), self.headers, self.to_table
            )
            refs.append(r)
            in_flight.append(r)
        if not refs:
            return ray.data.from_arrow(first_tbl)
        return ray.data.from_arrow_refs([ray.put(first_tbl), *refs])

    def _walk_pages(self, interval: TimeInterval, first_tbl, first_len: int):
        """Sequential cursor-less walk: fetch offset pages until one
        comes back shorter than page_size (the token-chain degradation
        documented in the module docstring)."""
        tables = [first_tbl]
        n = first_len
        off = self.page_size
        while n == self.page_size:
            rows = _fetch_json(self._page_url(interval, off), self.headers).get(
                "rows", []
            )
            n = len(rows)
            if n:
                tables.append(self.to_table(rows))
            off += self.page_size
        return ray.data.from_arrow(pa.concat_tables(tables))
