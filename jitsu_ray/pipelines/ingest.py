"""Multi-destination ingest: the reference's main path, end to end.

Mirrors Jitsu's event flow (SURVEY §3.1): events from a source are
multiplexed to N configured destinations (server/destinations/
service.go:111-117), each with its own mapping rules
(server/storages/factory.go:29), table-name router, and sink. Dead
letters (parse/transform failures) land once in the fallback dataset.

A ``Destination`` is the analog of one entry in the reference's
``destinations:`` YAML; ``mode="files"`` is the S3/file sink shape,
``mode="lake"`` the upsert-database shape (Postgres/ClickHouse →
LakeTable).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ..sinks.dead_letter import write_dead_letters
from ..sinks.files import write_routed
from ..sinks.lake import LakeTable
from ..stages.mapping import compile_mapping
from ..stages.router import route_stage
from ..stages.transform import TABLE_COL, split_dead_letters


@dataclass
class Destination:
    name: str
    path: str
    mapping: list = field(default_factory=list)
    keep_unmapped: bool = True
    router: str | Callable = "events"
    mode: str = "files"  # "files" | "lake"
    # lake mode:
    key_cols: tuple = ("repo", "path")
    num_partitions: int = 16
    window: tuple[int, int] | None = None  # (lo, hi) for the lake ledger
    only_tables: list[str] | None = None


def ingest(ds, destinations: list[Destination], failed_dir: str | None = None) -> dict:
    """Run one micro-batch of events through every destination.

    The source Dataset is lazy, so each destination's branch re-executes
    only its own pipeline (the reference's per-destination queues); dead
    letters are split off once from the shared source.
    """
    report: dict[str, Any] = {}
    # fan-out executes one branch per destination (+ the dead-letter
    # split): pin the parsed source's blocks once so N branches re-read
    # instead of re-executing the whole upstream pipeline N times (the
    # object store spills under pressure, so this is bounded-memory)
    if len(destinations) > 1 or failed_dir is not None:
        ds = ds.materialize()
    good = ds
    if failed_dir is not None and TABLE_COL in [
        f.name for f in ds.schema().base_schema
    ]:
        good, dead = split_dead_letters(ds)
        report["dead_letters"] = write_dead_letters(dead, failed_dir)

    for dest in destinations:
        branch = good
        if TABLE_COL in [f.name for f in branch.schema().base_schema]:
            branch = branch.map_batches(
                lambda b: b.drop_columns([c for c in (TABLE_COL, "__error", "__raw") if c in b.column_names]),
                batch_format="pyarrow",
            )
        if dest.mapping:
            branch = branch.map_batches(
                compile_mapping(dest.mapping, dest.keep_unmapped),
                batch_format="pyarrow",
            )
        branch = branch.map_batches(route_stage(dest.router), batch_format="pyarrow")
        if dest.mode == "lake":
            lake = LakeTable.create(dest.path, list(dest.key_cols), dest.num_partitions)
            lo, hi = dest.window or (lake.last_committed_hi(), lake.last_committed_hi() + 1)
            clean = branch.map_batches(
                lambda b: b.drop_columns([TABLE_COL]), batch_format="pyarrow"
            )
            entry = lake.apply_window(clean, lo, hi)
            report[dest.name] = {
                "mode": "lake",
                "rows": entry.get("metrics", {}).get("rows_written", 0),
            }
        else:
            counts = write_routed(branch, dest.path, tables=dest.only_tables)
            report[dest.name] = {"mode": "files", "tables": counts}
    return report
