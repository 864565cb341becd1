"""UDF transform hook (SURVEY §2.10): the planned-JS-transformations
contract, in Python.

The reference's design (design-docs/transformations.md:1-60, contract
transformations.d.ts:19-30) is `transform(event, ctx) -> [table, event
| event[]]` — a per-event function that may rename the destination
table, rewrite the event, multiply it into several events, or drop it
(return None). We wrap the identical contract into a map_batches stage:
rows are materialized to dicts for the UDF (row-level by contract — the
reference would have run user JS per event too), outputs are rebuilt
into an Arrow batch with a __table column, and the dead-letter channel
captures UDF exceptions per event instead of failing the batch
(fallback service analog, server/fallback/service.go:28-60).
"""

from __future__ import annotations

import json
import traceback
from collections.abc import Callable

import pyarrow as pa

from .router import TABLE_COL

# transform(event) -> None | (table, event) | (table, [event, ...])
TransformFn = Callable[[dict], None | tuple[str, dict] | tuple[str, list[dict]]]

ERROR_COL = "__error"
RAW_COL = "__raw"


def udf_transform_stage(
    fn: TransformFn, default_table: str = "events"
) -> Callable[[pa.Table], pa.Table]:
    def run(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out_rows: list[dict] = []
        for row in rows:
            try:
                res = fn(dict(row))
            except Exception:
                # dead-letter row: raw payload + error, routed to __table=""
                out_rows.append(
                    {
                        TABLE_COL: "",
                        ERROR_COL: traceback.format_exc(limit=1),
                        RAW_COL: json.dumps(row, default=str),
                    }
                )
                continue
            if res is None:
                continue  # dropped event
            table, events = res
            if isinstance(events, dict):
                events = [events]
            for e in events:
                e = dict(e)
                e[TABLE_COL] = table or default_table
                e.setdefault(ERROR_COL, None)
                e.setdefault(RAW_COL, None)
                out_rows.append(e)
        if not out_rows:
            return pa.table({TABLE_COL: pa.array([], pa.string())})
        # unify keys across produced rows (events may differ in shape)
        keys: list[str] = []
        for r in out_rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        return pa.table({k: [r.get(k) for r in out_rows] for k in keys})

    return run


def split_dead_letters(ds):
    """Fork a transformed Dataset into (good, dead_letter) — the fallback
    log. Both are lazy; write the dead letters to a `failed/` parquet
    dataset and re-ingest later to replay (POST /api/v1/replay analog)."""
    import pyarrow.compute as pc

    good = ds.map_batches(
        lambda b: b.filter(pc.not_equal(b[TABLE_COL], "")), batch_format="pyarrow"
    )
    dead = ds.map_batches(
        lambda b: b.filter(pc.equal(b[TABLE_COL], "")), batch_format="pyarrow"
    )
    return good, dead
