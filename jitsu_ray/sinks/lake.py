"""Partitioned last-writer-wins Parquet lake table.

The sink half of the CDC engine. Semantics are lifted from the
reference's upsert destinations — ClickHouse ReplacingMergeTree with a
version column (server/adapters/clickhouse.go:155-190) and Postgres
``INSERT ... ON CONFLICT DO UPDATE`` (server/adapters/postgres.go:49,
511-551) — but made *exact* and order-independent: for every key the
row with the maximum ``commit_seq`` wins, and wins as a tombstone if
that row is a delete. A later re-insert (higher seq) resurrects the key.

Physical design (LSM-ish, append-only):

    lake_dir/
      _meta.json                    # key cols, partition count, hash algo
      _schema/v000001.json          # logical payload schema versions
      _ledger/00000001.json ...     # commit log (state/ledger.py)
      part=00007/delta-<lo>-<hi>.parquet   # one window's winners for part 7
      part=00007/base-<n>.parquet          # compacted state

Applying a window only *appends* per-partition delta files containing
the window's per-key winners — O(window), never O(table) — so ingest
throughput is independent of accumulated table size. Resolution
(per-key argmax over base+deltas, drop tombstones) happens at read time
and is folded down by ``compact()``; both are per-partition and
shuffle-free because every key hashes to exactly one partition for the
table's lifetime.

Scale notes (the 100 TB design points):
  * The only all-to-all exchange per window is the hash partition
    (``groupby("__part")``) of the window's events — after a per-batch
    combiner has already collapsed duplicate keys, so the shuffle
    carries at most (unique keys in window) rows.
  * Hot repos are handled by hashing the full (repo, path) key: a
    Zipf-heavy repo's files spread uniformly over partitions. A single
    hot *key* is irreducible (its events must meet in one group) but
    the per-key merge is a cheap argmax.
  * Wide rows (multi-MB ``content``) stay in Arrow large_string; every
    stage is ``batch_format="pyarrow"``; nothing converts to pandas.
  * Writes are resumable/idempotent: delta paths are deterministic per
    window, invisible until the ledger row lands (state/ledger.py).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import polars as pl
import ray
import ray.data

from ..schema.reconciler import LakeSchema, observed_payload
from ..state.ledger import Ledger
from ..types import DataType
from ..util import HASH_ALGO, hash_mod_column, pad_and_cast

OP_COL = "op"
SEQ_COL = "commit_seq"
PART_COL = "__part"
TOMBSTONE = "delete"


def resolve_polars(df: pl.DataFrame, key_cols: list[str]) -> pl.DataFrame:
    """Per-key LWW fold: keep the max-seq row per key, drop tombstone
    winners. Order-independent; safe to apply repeatedly (idempotent)."""
    return (
        df.sort(SEQ_COL, descending=True)
        .unique(subset=key_cols, keep="first", maintain_order=True)
        .filter(pl.col(OP_COL) != TOMBSTONE)
    )


def resolve_arrow(tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    return resolve_polars(pl.from_arrow(tbl), key_cols).to_arrow().cast(tbl.schema)


class LakeTable:
    def __init__(self, lake_dir: str):
        self.dir = lake_dir
        with open(os.path.join(lake_dir, "_meta.json")) as f:
            meta = json.load(f)
        self.key_cols: list[str] = meta["key_cols"]
        self.num_partitions: int = meta["num_partitions"]
        self.schema_dir = os.path.join(lake_dir, "_schema")
        self.ledger = Ledger(os.path.join(lake_dir, "_ledger"))
        self.schema = LakeSchema.load(self.schema_dir)

    # -- lifecycle ----------------------------------------------------------

    @staticmethod
    def create(
        lake_dir: str, key_cols: list[str], num_partitions: int = 64
    ) -> "LakeTable":
        os.makedirs(lake_dir, exist_ok=True)
        os.makedirs(os.path.join(lake_dir, "_schema"), exist_ok=True)
        meta_path = os.path.join(lake_dir, "_meta.json")
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "key_cols": list(key_cols),
                        "num_partitions": num_partitions,
                        "hash_algo": HASH_ALGO,
                    },
                    f,
                )
        return LakeTable(lake_dir)

    @staticmethod
    def open(lake_dir: str) -> "LakeTable":
        return LakeTable(lake_dir)

    # -- schema -------------------------------------------------------------

    @property
    def system_cols(self) -> set[str]:
        return {OP_COL, SEQ_COL, PART_COL, *self.key_cols}

    def full_arrow_schema(self) -> pa.Schema:
        fields = [
            pa.field(PART_COL, pa.int32()),
            pa.field(OP_COL, pa.string()),
            pa.field(SEQ_COL, pa.int64()),
        ]
        fields += [pa.field(k, pa.large_string()) for k in self.key_cols]
        fields += self.schema.to_arrow_fields()
        return pa.schema(fields)

    def _reconcile_window_schema(self, ds_schema: pa.Schema) -> None:
        observed = observed_payload(ds_schema, self.system_cols)
        if self.schema.reconcile(observed):
            # Additive + idempotent: persisting before the ledger commit is
            # safe (a crashed window leaves a wider schema, which re-running
            # the window reproduces).
            self.schema.save(self.schema_dir)

    # -- write path ---------------------------------------------------------

    def apply_window(
        self, ds: "ray.data.Dataset", lo: int, hi: int, extra_metrics: dict | None = None
    ) -> dict:
        """Apply one micro-batch window of change events.

        ``ds`` must contain op, commit_seq, the key columns, and any
        payload columns. Returns the committed ledger entry.
        """
        if hi <= self.ledger.last_committed_hi():
            # Idempotent replay: window already committed (M8 / D3 analog —
            # the "already uploaded" skip, logfiles/uploader.go:103-109).
            return {"kind": "window", "lo": lo, "hi": hi, "skipped": True}

        self._reconcile_window_schema(ds.schema().base_schema)
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        num_parts = self.num_partitions
        lake_dir = self.dir
        window_tag = f"{lo:012d}-{hi:012d}"

        def prep(batch: pa.Table) -> pa.Table:
            # combiner: partition id + within-batch per-key pre-reduce, so
            # the shuffle moves at most one row per (key, batch)
            batch = pad_and_cast(batch, target)
            part = hash_mod_column(batch, key_cols, num_parts)
            batch = batch.set_column(0, PART_COL, part)
            return resolve_keep_tombstones(batch, key_cols)

        def write_delta(group: pa.Table) -> pa.Table:
            part = group.column(PART_COL)[0].as_py()
            merged = resolve_keep_tombstones(group, key_cols)
            part_dir = os.path.join(lake_dir, f"part={part:05d}")
            os.makedirs(part_dir, exist_ok=True)
            rel = f"part={part:05d}/delta-{window_tag}.parquet"
            final = os.path.join(lake_dir, rel)
            fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
            os.close(fd)
            pq.write_table(merged, tmp)
            os.replace(tmp, final)  # deterministic path => idempotent retry
            n_tomb = merged.filter(pc.equal(merged[OP_COL], TOMBSTONE)).num_rows
            return pa.table(
                {
                    "part": pa.array([part], pa.int32()),
                    "file": pa.array([rel], pa.string()),
                    "rows": pa.array([merged.num_rows], pa.int64()),
                    "tombstones": pa.array([n_tomb], pa.int64()),
                    "bytes": pa.array([os.path.getsize(final)], pa.int64()),
                }
            )

        stats_rows = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby(PART_COL)
            .map_groups(write_delta, batch_format="pyarrow")
            .take_all()
        )

        entry = {
            "kind": "window",
            "lo": lo,
            "hi": hi,
            "schema_version": self.schema.version,
            "files": {str(r["part"]): r["file"] for r in stats_rows},
            "metrics": {
                "partitions": len(stats_rows),
                "rows_written": int(sum(r["rows"] for r in stats_rows)),
                "tombstones": int(sum(r["tombstones"] for r in stats_rows)),
                "bytes_written": int(sum(r["bytes"] for r in stats_rows)),
                "per_partition": [
                    {k: r[k] for k in ("part", "rows", "tombstones", "bytes")}
                    for r in stats_rows
                ],
                **(extra_metrics or {}),
            },
        }
        self.ledger.append(entry)
        return entry

    # -- read path ----------------------------------------------------------

    def live_files(self) -> dict[int, list[str]]:
        return {
            p: [os.path.join(self.dir, f) for f in fs]
            for p, fs in self.ledger.live_files().items()
            if fs
        }

    def read(self, columns: list[str] | None = None) -> "ray.data.Dataset":
        """Resolved view of the table as a streaming Dataset.

        Old files are null-padded / up-cast to the current reconciled
        schema by the parquet scanner (``schema=``); per-partition LWW
        resolution runs in ``map_groups`` — partitions never share keys,
        so per-partition resolution equals global resolution.
        """
        files = [f for fs in self.live_files().values() for f in fs]
        target = self.full_arrow_schema()
        if not files:
            empty = target.empty_table().drop_columns([PART_COL, OP_COL])
            return ray.data.from_arrow(empty)
        key_cols = self.key_cols

        def resolve_group(group: pa.Table) -> pa.Table:
            return resolve_arrow(group, key_cols).drop_columns([PART_COL, OP_COL])

        ds = (
            ray.data.read_parquet(files, schema=target)
            .groupby(PART_COL)
            .map_groups(resolve_group, batch_format="pyarrow")
        )
        if columns:
            ds = ds.select_columns(columns)
        return ds

    # -- maintenance --------------------------------------------------------

    def compact(self, min_files: int = 2, tombstone_watermark: int = 0) -> dict:
        """Fold each partition's base+deltas into a single base file.

        ``tombstone_watermark``: tombstone winners with commit_seq <= the
        watermark are physically dropped. Only pass a nonzero watermark
        when no future window can deliver an event with a lower seq (the
        seq-range replayer guarantees this; arrival-ordered ingest with
        cross-window disorder must keep tombstones, else a late lower-seq
        update would wrongly resurrect a deleted key).

        Raw Ray tasks (not Dataset) by design: this is per-partition file
        maintenance with no cross-partition dataflow — each task reads
        only its own partition's files. One ledger row commits all
        compacted partitions atomically; a crash mid-compaction leaves
        only orphaned tmp files.
        """
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        lake_dir = self.dir
        gen = self.ledger.next_seq()

        @ray.remote
        def compact_part(part: int, files: list[str]) -> tuple[int, dict]:
            tbl = pq.ParquetDataset(files, schema=target).read()
            merged = resolve_keep_tombstones(tbl, key_cols)
            if tombstone_watermark > 0:
                drop = pc.and_(
                    pc.equal(merged[OP_COL], TOMBSTONE),
                    pc.less_equal(merged[SEQ_COL], tombstone_watermark),
                )
                merged = merged.filter(pc.invert(drop))
            part_dir = os.path.join(lake_dir, f"part={part:05d}")
            rel = f"part={part:05d}/base-{gen:08d}.parquet"
            fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
            os.close(fd)
            pq.write_table(merged, tmp)
            os.replace(tmp, os.path.join(lake_dir, rel))
            return part, {
                "file": rel,
                "replaces": [os.path.relpath(f, lake_dir) for f in files],
                "rows": merged.num_rows,
            }

        todo = {p: fs for p, fs in self.live_files().items() if len(fs) >= min_files}
        if not todo:
            return {"kind": "compact", "parts": {}}
        results = ray.get(
            [compact_part.remote(p, fs) for p, fs in sorted(todo.items())]
        )
        entry = {"kind": "compact", "parts": {str(p): info for p, info in results}}
        self.ledger.append(entry)
        for _, info in results:  # best-effort cleanup; ledger already excludes
            for f in info["replaces"]:
                try:
                    os.unlink(os.path.join(self.dir, f))
                except OSError:
                    pass
        return entry

    def last_committed_hi(self) -> int:
        return self.ledger.last_committed_hi()


def resolve_keep_tombstones(tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    """Per-key argmax(commit_seq) keeping tombstone winners (needed while
    later windows may still merge against this state)."""
    if tbl.num_rows == 0:
        return tbl
    df = pl.from_arrow(tbl)
    out = df.sort(SEQ_COL, descending=True).unique(
        subset=key_cols, keep="first", maintain_order=True
    )
    return out.to_arrow().cast(tbl.schema)
