"""Multi-source interval synchronization (SURVEY §2.1 S6 pull-driver
framework): N logical (source, collection) pairs sharing one lake, each
with per-interval signature bookkeeping.

Reference parity: the task executor walks a driver's available
intervals, skips UPTODATE ones by stored signature, syncs NEW/REFRESH
chunks, and persists the signature after upload
(server/synchronization/task_executor.go:200-258). Round 1 covered the
single-source case with the ledger's seq-window skip; this adds the
keyed store (state/signatures.py) for many sources.

Ray-first shape: the per-interval ``loader`` returns a lazy Dataset;
the sink callable consumes it (lake refresh-replace or file write). The
signature is saved only AFTER the sink returns, so a crash mid-interval
re-syncs that interval on restart — correct because both provided sinks
are idempotent (LWW lake; _SUCCESS-marked file dirs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Callable

from ..state.signatures import SignatureStore, TimeInterval, plan_intervals


@dataclass
class Collection:
    """One logical (source, collection) sync unit — the analog of a
    ``collections:`` entry in the reference's source YAML."""

    source: str
    name: str
    table: str  # destination table (part of the signature key)
    intervals: Callable[[], list[TimeInterval]]
    loader: Callable[[TimeInterval], Any]  # -> ray.data.Dataset
    params: dict = field(default_factory=dict)

    @property
    def collection_key(self) -> str:
        # Collection + "_" + driver.GetCollectionTable()
        return f"{self.name}_{self.table}"


def sync_collections(
    collections: list[Collection],
    store: SignatureStore,
    sink: Callable[[Any, Collection, TimeInterval], None],
    now: datetime | None = None,
) -> dict:
    """Run one sync sweep. Returns per-collection interval statuses and
    counts {"synced": n, "skipped": n, "detail": {...}}."""
    now = now or datetime.utcnow()
    synced = skipped = 0
    detail: dict[str, list] = {}
    for col in collections:
        plan = plan_intervals(store, col.source, col.collection_key, col.intervals(), now)
        statuses = []
        for interval, status in plan:
            if status == "UPTODATE":
                skipped += 1
            else:
                ds = col.loader(interval)
                sink(ds, col, interval)
                store.save(
                    col.source,
                    col.collection_key,
                    interval.key(),
                    interval.signature_from(now),
                )
                synced += 1
            statuses.append((interval.key(), status))
        detail[f"{col.source}/{col.collection_key}"] = statuses
    return {"synced": synced, "skipped": skipped, "detail": detail}
