"""File sinks (SURVEY §2.1 K6 + M7 fan-out writes).

The reference's S3/GCS sink writes one JSON-lines object per (file,
table) (server/storages/s3.go:70-106); the multiplexer fans one event
stream out to N destinations (handlers/event.go:97-115). Here: routed
Datasets (rows carrying ``__table``) are written as partitioned Parquet
— one directory per destination table — atomically enough to be
resumable (a table directory is complete when its ``_SUCCESS`` marker
exists; reruns skip completed tables).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from ..stages.router import TABLE_COL, fan_out


def write_routed(ds, base_dir: str, tables: list[str] | None = None,
                 fmt: str = "parquet") -> dict[str, int]:
    """Write a routed Dataset to ``base_dir/<table>/`` per destination.

    ``tables``: known destinations (skips discovery); otherwise discovered
    with a cheap distinct over the routing column. Returns row counts.
    Completed tables (``_SUCCESS`` present) are skipped on rerun.
    """
    if tables is None:
        tables = sorted(v for v in ds.unique(TABLE_COL) if v)
    counts: dict[str, int] = {}
    for table, sub in fan_out(ds, tables).items():
        out_dir = os.path.join(base_dir, table)
        marker = os.path.join(out_dir, "_SUCCESS")
        if os.path.exists(marker):
            counts[table] = -1  # already complete; skipped (idempotent rerun)
            continue
        os.makedirs(out_dir, exist_ok=True)
        # no _SUCCESS marker: any files present are a crashed run's
        # leftovers — clear them so write + metadata count see only
        # this run's output
        for name in os.listdir(out_dir):
            if not name.startswith("_"):
                os.remove(os.path.join(out_dir, name))
        clean = sub.map_batches(
            lambda b: b.drop_columns([TABLE_COL]), batch_format="pyarrow"
        )
        # ONE execution: write, then count from the written files'
        # metadata (parquet footers / json line counts) instead of a
        # separate count() that would re-run the whole lazy pipeline
        if fmt == "json":
            clean.write_json(out_dir)
            n = 0
            for name in os.listdir(out_dir):
                if name.startswith("_"):
                    continue
                with open(os.path.join(out_dir, name), "rb") as f:
                    n += sum(1 for _ in f)
        else:
            clean.write_parquet(out_dir)
            import pyarrow.parquet as pq

            n = sum(
                pq.ParquetFile(os.path.join(out_dir, name)).metadata.num_rows
                for name in os.listdir(out_dir)
                if name.endswith(".parquet")
            )
        with open(marker, "w") as f:
            f.write(str(n))
        counts[table] = n
    return counts
