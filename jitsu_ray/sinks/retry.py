"""Streaming sink retry/backoff (SURVEY §2.9 streaming semantics).

Reference parity: the stream worker classifies sink errors and
re-enqueues transient failures with a retry deadline (now+20s), falling
back to the dead-letter log once retries are exhausted or the error is
permanent (server/storages/streaming.go:108-122,
server/adapters/clickhouse.go transient error lists).

Ray-first shape: the sink call runs inside an actor-pool map_batches
stage; each actor retries ITS batch inline with bounded exponential
backoff (the batch is already in the actor's heap — re-enqueueing it
through the object store would just add copies), and rows that exhaust
retries or hit a permanent error flow OUT of the stage tagged with the
error, so one downstream split sends them to the dead-letter parquet.
The stream never stalls on a poison batch and the driver sees exact
written/retried/dead counts.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.transform import ERROR_COL, RAW_COL, TABLE_COL


class TransientSinkError(Exception):
    """Retryable sink failure (timeouts, throttling, connection reset)."""


class PermanentSinkError(Exception):
    """Non-retryable sink failure (schema violation, auth, bad payload)."""


def default_classify(err: Exception) -> bool:
    """True = transient. Unknown exceptions count as transient once —
    the reference treats unclassified driver errors as retryable."""
    if isinstance(err, PermanentSinkError):
        return False
    return True


STATUS_COL = "__sink_status"  # "ok" | "dead"


class RetryingSinkStage:
    """map_batches actor: calls ``write_batch(batch) -> None`` with
    retry/backoff; emits one status row per input row so downstream can
    split dead letters and count retries. Construct via
    ``sink_with_retry``."""

    def __init__(self, write_batch, max_attempts: int = 3, backoff_sec: float = 0.05,
                 classify=default_classify, cache=None, cache_dest: str = "",
                 cache_id_col: str | None = None, cache_max_push: int = 100):
        self.write_batch = write_batch
        self.max_attempts = max_attempts
        self.backoff_sec = backoff_sec
        self.classify = classify
        # T6 events cache: fire-and-forget per-batch succeed/error pushes.
        # cache_max_push should match the ring's capacity_per_destination
        # (pushing more than the ring keeps is waste; pushing less would
        # leave earlier rows' statuses stale)
        self.cache = cache
        self.cache_dest = cache_dest
        self.cache_id_col = cache_id_col
        self.cache_max_push = cache_max_push

    def _cache_ids(self, batch):
        if self.cache is None or self.cache_id_col not in batch.column_names:
            return None
        return batch[self.cache_id_col].to_pylist()

    def _push_status(self, ids, offset, msg=None):
        """succeed for the delivered prefix, error for the unsent suffix
        — each capped to the ring-size tail (older entries would be
        evicted by the newer pushes anyway)."""
        ok = ids[:offset][-self.cache_max_push :]
        if ok:
            self.cache.succeed_many.remote(self.cache_dest, ok)
        if msg is not None:
            bad = ids[offset:][-self.cache_max_push :]
            if bad:
                self.cache.error_many.remote(self.cache_dest, bad, msg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        attempts = 0
        err: Exception | None = None
        # high-water mark: rows [0, offset) are durably delivered. A
        # row-wise sink (e.g. GA: one GET per row) reports partial
        # progress by attaching ``rows_sent`` to the raised exception;
        # each retry then resumes from the first unsent row instead of
        # re-sending the whole batch (unbounded duplicate delivery).
        # Sinks that don't report progress keep batch-level
        # at-least-once semantics (retry re-sends the batch).
        offset = 0
        while attempts < self.max_attempts:
            try:
                self.write_batch(batch.slice(offset) if offset else batch)
                ids = self._cache_ids(batch)
                if ids is not None:
                    self._push_status(ids, len(ids))
                return pa.table(
                    {
                        STATUS_COL: pa.array(["ok"] * batch.num_rows, pa.string()),
                        ERROR_COL: pa.nulls(batch.num_rows, pa.string()),
                        "attempts": pa.array([attempts + 1] * batch.num_rows, pa.int32()),
                        RAW_COL: pa.nulls(batch.num_rows, pa.string()),
                    }
                )
            except Exception as e:  # noqa: BLE001 — sink boundary
                err = e
                offset += max(0, int(getattr(e, "rows_sent", 0)))
                attempts += 1
                if not self.classify(e) or attempts >= self.max_attempts:
                    break
                # bounded exponential backoff (streaming.go re-enqueues
                # with now+20s; scaled down for micro-batch cadence)
                time.sleep(self.backoff_sec * (2 ** (attempts - 1)))
        # exhausted or permanent: only the UNSENT rows go to the dead
        # letter; rows below the high-water mark were delivered
        import json

        msg = f"{type(err).__name__}: {err}"
        # JSON (not repr): replay_failed re-parses RAW_COL with json.loads
        n_dead = batch.num_rows - offset
        ids = self._cache_ids(batch)
        if ids is not None:
            self._push_status(ids, offset, msg)
        raw = [json.dumps(r, default=str) for r in batch.slice(offset).to_pylist()]
        return pa.table(
            {
                STATUS_COL: pa.array(
                    ["ok"] * offset + ["dead"] * n_dead, pa.string()
                ),
                ERROR_COL: pa.array([None] * offset + [msg] * n_dead, pa.string()),
                "attempts": pa.array([attempts] * batch.num_rows, pa.int32()),
                RAW_COL: pa.array([None] * offset + raw, pa.string()),
            }
        )


def sink_with_retry(ds, write_batch, failed_dir: str | None = None,
                    max_attempts: int = 3, backoff_sec: float = 0.05,
                    classify=default_classify, concurrency: int = 2,
                    batch_size: int | None = None, events_cache=None,
                    cache_dest: str = "", cache_id_col: str | None = None,
                    cache_max_push: int = 100) -> dict:
    """Drive a Dataset into a per-batch sink with retry/backoff and
    dead-letter fallback. Returns {"written", "dead", "max_attempts_seen"}.

    The sink stage streams (actor pool); only the tiny per-row status
    table flows back. Dead rows (retries exhausted / permanent errors)
    are appended to ``failed_dir`` as parquet via the K9 dead-letter
    sink, preserving the raw payload + error for replay_failed."""
    from .dead_letter import write_dead_letters

    stage = ds.map_batches(
        RetryingSinkStage,
        batch_format="pyarrow",
        concurrency=concurrency,
        **({"batch_size": batch_size} if batch_size else {}),
        fn_constructor_kwargs={
            "write_batch": write_batch,
            "max_attempts": max_attempts,
            "backoff_sec": backoff_sec,
            "classify": classify,
            "cache": events_cache,
            "cache_dest": cache_dest,
            "cache_id_col": cache_id_col,
            "cache_max_push": cache_max_push,
        },
    ).materialize()
    dead = stage.filter(lambda r: r[STATUS_COL] == "dead")
    n_dead = dead.count()
    if n_dead and failed_dir:
        dead_tagged = dead.map_batches(
            lambda b: b.append_column(TABLE_COL, pa.array([""] * b.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        write_dead_letters(dead_tagged, failed_dir)
    total = stage.count()
    max_att = stage.max("attempts") if total else 0
    return {
        "written": total - n_dead,
        "dead": n_dead,
        "max_attempts_seen": int(max_att or 0),
    }
