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

        Page 0 driver-side (learns ``total``), pages 1..N as parallel
        Ray tasks whose Arrow tables become the Dataset's blocks."""
        first = _fetch_json(self._page_url(interval, 0), self.headers)
        total = int(first.get("total", len(first.get("rows", []))))
        tables = [self.to_table(first.get("rows", []))]
        offsets = list(range(self.page_size, total, self.page_size))
        refs = []
        for i in range(0, len(offsets), self.max_parallel_pages):
            chunk = offsets[i : i + self.max_parallel_pages]
            batch_refs = [
                _fetch_page_task.remote(
                    self._page_url(interval, off), self.headers, self.to_table
                )
                for off in chunk
            ]
            refs.extend(batch_refs)
        if not refs:
            return ray.data.from_arrow(tables[0])
        return ray.data.from_arrow_refs([ray.put(tables[0]), *refs])
