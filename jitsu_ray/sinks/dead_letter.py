"""Dead-letter (fallback) sink + replay (SURVEY §2.1 K9).

The reference appends failed events to ``events/failed/failed.dst=X.log``
with the raw payload + error (server/fallback/service.go:28-60) and can
re-ingest them via ``POST /api/v1/replay``. Here: failed rows (rows with
``__table == ""`` and ``__error`` set, produced by the UDF transform /
NDJSON parser) are written to a ``failed/`` parquet dataset partitioned
by batch id; ``replay_failed`` re-parses the raw payloads through a
(presumably fixed) transform and returns the recovered Dataset plus the
still-failing remainder.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.transform import ERROR_COL, RAW_COL, TABLE_COL

FAILED_SCHEMA = pa.schema(
    [(TABLE_COL, pa.string()), (ERROR_COL, pa.string()), (RAW_COL, pa.string())]
)


def write_dead_letters(dead_ds, failed_dir: str) -> int:
    """Persist dead-letter rows as parquet (one dir per ingest attempt =
    resumable layout); returns the count."""
    os.makedirs(failed_dir, exist_ok=True)
    norm = dead_ds.map_batches(
        lambda b: pa.table(
            {
                TABLE_COL: pc.cast(b[TABLE_COL], pa.string()),
                ERROR_COL: pc.cast(b[ERROR_COL], pa.string()),
                RAW_COL: pc.cast(b[RAW_COL], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    n = norm.count()
    if n:
        norm.write_parquet(failed_dir)
    return n


def replay_failed(failed_dir: str, transform_stage):
    """Re-ingest the dead-letter dataset through a transform stage
    (the /api/v1/replay analog). Returns (recovered_ds, still_failed_ds).
    """

    def reparse(batch: pa.Table) -> pa.Table:
        rows = []
        for raw in batch[RAW_COL].to_pylist():
            try:
                obj = json.loads(raw) if raw else {}
            except Exception:
                obj = {"__raw": raw}
            rows.append(obj)
        if not rows:
            return pa.table({"__dummy": pa.array([], pa.int8())})
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        return pa.table({k: [r.get(k) for r in rows] for k in keys})

    ds = ray.data.read_parquet(failed_dir).map_batches(reparse, batch_format="pyarrow")
    out = ds.map_batches(transform_stage, batch_format="pyarrow")
    from ..stages.transform import split_dead_letters

    return split_dead_letters(out)
