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
from datetime import datetime, timedelta
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


def run_scheduler(
    schedules: list[tuple[Collection, timedelta]],
    store: SignatureStore,
    sink: Callable[[Any, Collection, TimeInterval], None],
    *,
    max_workers: int = 4,
    max_ticks: int | None = None,
    stop: Callable[[], bool] | None = None,
    clock: Callable[[], datetime] | None = None,
    sleep: Callable[[float], None] | None = None,
    poll_seconds: float = 1.0,
) -> dict:
    """Long-running recurring sync loop — the analog of the reference's
    cron -> priority queue -> worker-pool dispatch
    (server/scheduling/, server/synchronization/task_executor.go:65-119)
    without the Redis dependency: the SignatureStore already makes every
    sweep idempotent, so scheduling reduces to per-collection due times.

    - Each (collection, period) pair runs at most every ``period``; on
      each loop tick every DUE collection is dispatched to a BOUNDED
      thread pool (``max_workers`` — the worker-pool cap; each worker
      drives its own Ray Data pipeline, so driver threads, not Ray
      tasks, are the right unit here).
    - **Per-(source, collection) mutual exclusion**: a collection whose
      previous run is still in flight is NOT dispatched again — the
      tick records it ``busy`` and its next due time still advances, so
      a slow source can never pile up overlapping syncs of itself
      (the reference holds a per-task lock for the same reason).
    - A failing collection run is recorded (``errors``) and the loop
      continues; the signature store guarantees the failed intervals
      are re-planned NEW/REFRESH next time.
    - ``clock``/``sleep`` are injectable for deterministic fake-clock
      tests; ``max_ticks``/``stop`` bound the loop (None = forever).

    Returns totals: {"ticks", "runs", "synced", "skipped", "busy",
    "errors": [(key, repr(exc)), ...], "detail": {key: [run stats]}}.
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    clock = clock or datetime.utcnow
    sleep = sleep or _time.sleep
    items = [
        (f"{col.source}/{col.collection_key}", col, period)
        for col, period in schedules
    ]
    if len({k for k, _, _ in items}) != len(items):
        raise ValueError("duplicate (source, collection) in schedules")
    if not items:  # config-driven caller with zero enabled collections
        return {"ticks": 0, "runs": 0, "synced": 0, "skipped": 0,
                "busy": 0, "errors": [], "detail": {}}
    next_due: dict[str, datetime] = {k: datetime.min for k, _, _ in items}
    inflight: dict[str, Any] = {}
    totals = {"ticks": 0, "runs": 0, "synced": 0, "skipped": 0, "busy": 0,
              "errors": [], "detail": {k: [] for k, _, _ in items}}

    def reap(block: bool = False) -> None:
        for k in list(inflight):
            fut = inflight[k]
            if not (block or fut.done()):
                continue
            del inflight[k]
            try:
                res = fut.result()
            except Exception as exc:  # keep the loop alive; re-planned next tick
                totals["errors"].append((k, repr(exc)))
                continue
            totals["runs"] += 1
            totals["synced"] += res["synced"]
            totals["skipped"] += res["skipped"]
            totals["detail"][k].append(res["detail"])

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        while True:
            if stop is not None and stop():
                break
            now = clock()
            for key, col, period in items:
                if next_due[key] > now:
                    continue
                # schedule from dispatch time, busy or not — a slow run
                # must not cause a burst of catch-up syncs when it ends
                next_due[key] = now + period
                if key in inflight and not inflight[key].done():
                    totals["busy"] += 1
                    continue
                reap()  # collect a finished future before re-dispatch
                inflight[key] = pool.submit(
                    sync_collections, [col], store, sink, now
                )
            reap()
            totals["ticks"] += 1
            if max_ticks is not None and totals["ticks"] >= max_ticks:
                break
            wake = min(next_due.values())
            gap = (wake - clock()).total_seconds()
            sleep(max(0.0, min(poll_seconds, gap)))
        reap(block=True)
    return totals
