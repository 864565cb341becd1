"""Per-(source, collection, interval) sync signatures (SURVEY §2.1 S6).

Reference parity: the task executor fetches each interval's stored
signature, marks it NEW (no signature), REFRESH (signature changed, or
the catch-all interval) or UPTODATE (skip), syncs only the first two,
and persists the new signature after upload
(server/synchronization/task_executor.go:210-258). A time interval's
signature is ``min(now - 1d lag, interval upper endpoint)`` so closed
intervals freeze while recent ones keep refreshing until a day past
their end (server/drivers/time_interval.go:31-39).

This replaces round 1's single-ledger seq-window skip for the multi-
logical-source case: N sources x M collections can share one lake, each
with independent interval bookkeeping.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass
from datetime import datetime, timedelta

SIGNATURE_LAYOUT = "%Y-%m-%dT%H:%M:%S"
ALL = "ALL"
DAY = "DAY"
MONTH = "MONTH"


@dataclass(frozen=True)
class TimeInterval:
    """One sync chunk of a collection: a DAY / MONTH bucket or the
    catch-all ALL interval (always refreshed)."""

    granularity: str  # DAY | MONTH | ALL
    time: datetime | None = None  # bucket start; None for ALL

    def is_all(self) -> bool:
        return self.granularity == ALL

    def upper_endpoint(self) -> datetime:
        if self.is_all():
            return datetime.max
        if self.granularity == DAY:
            return self.time + timedelta(days=1)
        # MONTH
        y, m = self.time.year, self.time.month
        return datetime(y + (m == 12), m % 12 + 1, 1)

    def signature_from(self, now: datetime) -> str:
        """min(now - 1d, upper endpoint): a closed interval's signature
        stops changing one day after it ends — UPTODATE forever."""
        lagged = now - timedelta(days=1)
        point = lagged if lagged < self.upper_endpoint() else self.upper_endpoint()
        return point.strftime(SIGNATURE_LAYOUT)

    def key(self) -> str:
        if self.is_all():
            return ALL
        fmt = "%Y%m%d" if self.granularity == DAY else "%Y%m"
        return f"{self.granularity}_{self.time.strftime(fmt)}"


class SignatureStore:
    """Keyed signature persistence: one JSON file per source (atomic
    tmp+rename writes, same durability contract as the ledger). Layout:
    ``dir/<source>.json`` -> {"<collection_key>": {"<interval_key>": sig}}.
    """

    def __init__(self, dir_path: str):
        import threading

        self.dir = dir_path
        # serialize read-modify-write saves within this process: two
        # collections of the SAME source share one JSON file, and the
        # scheduler runs collections on a thread pool — an unguarded
        # concurrent save would drop the other thread's signature
        self._lock = threading.Lock()
        os.makedirs(dir_path, exist_ok=True)

    def _path(self, source: str) -> str:
        safe = source.replace(os.sep, "_")
        return os.path.join(self.dir, f"{safe}.json")

    def _load(self, source: str) -> dict:
        try:
            with open(self._path(source)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def get(self, source: str, collection_key: str, interval_key: str) -> str:
        return self._load(source).get(collection_key, {}).get(interval_key, "")

    def save(self, source: str, collection_key: str, interval_key: str, signature: str) -> None:
        with self._lock:
            data = self._load(source)
            data.setdefault(collection_key, {})[interval_key] = signature
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self._path(source))

    def clear(self, source: str, collection_key: str | None = None) -> None:
        """Force full re-sync of a source (or one collection)."""
        with self._lock:
            if collection_key is None:
                try:
                    os.remove(self._path(source))
                except FileNotFoundError:
                    pass
                return
            data = self._load(source)
            data.pop(collection_key, None)
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self._path(source))


def plan_intervals(
    store: SignatureStore,
    source: str,
    collection_key: str,
    intervals: list[TimeInterval],
    now: datetime,
) -> list[tuple[TimeInterval, str]]:
    """(interval, status) per interval; status NEW | REFRESH | UPTODATE.
    Only NEW/REFRESH need syncing (task_executor.go:221-232)."""
    out = []
    for iv in intervals:
        stored = store.get(source, collection_key, iv.key())
        now_sig = iv.signature_from(now)
        if not stored:
            out.append((iv, "NEW"))
        elif stored != now_sig or iv.is_all():
            out.append((iv, "REFRESH"))
        else:
            out.append((iv, "UPTODATE"))
    return out
