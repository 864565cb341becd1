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
        if sub.schema() is None:
            # an explicitly-requested table no event routed to: a map
            # over zero blocks has no schema at all — mark it complete
            # with 0 rows instead of crashing the fmt branches below
            with open(marker, "w") as f:
                f.write("0")
            counts[table] = 0
            continue
        clean = sub.map_batches(
            lambda b: b.drop_columns([TABLE_COL]), batch_format="pyarrow"
        )
        # ONE execution: write, then count from the written files'
        # metadata (parquet footers / json line counts) instead of a
        # separate count() that would re-run the whole lazy pipeline
        if fmt == "csv":
            fields = [
                f.name
                for f in sub.schema().base_schema
                if f.name != TABLE_COL
            ]
            n = _write_csv_dir(clean, out_dir, fields)
        elif fmt == "json":
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


def marshal_csv_lines(batch, fields: list[str]) -> list[str]:
    """``||``-delimited CSV marshalling (reference
    server/schema/marshaller.go:33-57): each value JSON-serialized, a
    string value's surrounding quotes stripped, fields joined with
    ``||`` in header order; null/absent values emit empty. Cold egress
    path — the per-value json.dumps row loop is deliberate."""
    import json

    cols = {f: batch[f].to_pylist() if f in batch.column_names else [None] * batch.num_rows for f in fields}
    lines = []
    for i in range(batch.num_rows):
        parts = []
        for f in fields:
            v = cols[f][i]
            if v is None:
                parts.append("")
                continue
            b = json.dumps(v, default=str)
            if len(b) >= 2 and b[0] == '"' and b[-1] == '"':
                b = b[1:-1]
            parts.append(b)
        lines.append("||".join(parts))
    return lines


def _write_csv_dir(ds, out_dir: str, fields: list[str]) -> int:
    """Each map task writes one header-prefixed ``||``-CSV file (the
    reference writes a header per uploaded object — NeedHeader); row
    count flows back as the only task output."""
    import uuid

    import pyarrow as pa

    header = "||".join(fields)

    def write_block(batch: pa.Table) -> pa.Table:
        lines = marshal_csv_lines(batch, fields)
        if lines:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.csv")
            with open(path, "w") as f:
                f.write(header + "\n")
                f.write("\n".join(lines) + "\n")
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in counts))


def write_sharded_parquet(ds, out_dir: str, id_col: str, num_shards: int = 64):
    """Resumable hash-sharded Parquet export (see ``_write_sharded``
    for the full contract). Read back with
    ``ray.data.read_parquet(out_dir)``."""
    import pyarrow.parquet as pq

    return _write_sharded(
        ds, out_dir, id_col, num_shards, "parquet", pq.write_table
    )


def write_sharded_jsonl(ds, out_dir: str, id_col: str, num_shards: int = 64):
    """Resumable hash-sharded JSONL (NDJSON) export — the training-data
    interchange format (see ``_write_sharded`` for the resume/manifest
    contract, identical to the Parquet variant).

    Serialization is polars ``write_ndjson`` (vectorized Rust, one JSON
    object per line): nulls emit ``null``, timestamps ISO-8601, nested
    list/struct columns as JSON arrays/objects. Use it for
    JSON-representable schemas (text corpora); raw ``binary`` payloads
    belong in the Parquet variant. Read back with
    ``ray.data.read_json(out_dir, file_extensions=["jsonl"])`` — the
    extension pin keeps ``_export_meta.json`` out of the dataset.
    """
    import polars as pl

    def _write(body, path: str) -> None:
        pl.from_arrow(body).write_ndjson(path)

    return _write_sharded(ds, out_dir, id_col, num_shards, "jsonl", _write)


def _write_sharded(ds, out_dir: str, id_col: str, num_shards: int,
                   fmt: str, write_table) -> dict[str, int]:
    """RESUMABLE hash-sharded corpus export: ``out_dir/shard=NNNN.<fmt>``
    with a ``_shard=NNNN.done`` row-count manifest per shard (the ``_``
    prefix keeps manifests invisible to parquet dataset readers) — the
    training-data-export analog of the lake's per-partition manifests.

    Shard assignment is ``md5_lower64(str(id)) % num_shards`` (the
    repo's SQL-auditable split-rule family): stable across runs, row
    order, batch boundaries and cluster sizes, so a failed run's rerun
    reproduces the exact same shard contents. Null ids land in shard 0
    (their hash slot is 0).

    Resume: finished shards are filtered out BEFORE the shuffle — a
    rerun ships only the missing shards' rows through the exchange, not
    the corpus. Each shard writes its file atomically (tmp +
    os.replace, the lake convention) and only then its ``.done``; a
    crash between the two leaves an orphan data file that the rerun
    simply overwrites. Empty shards get a driver-written ``rows=0``
    manifest so a fully-complete directory skips everything.

    Writers run inside ``map_groups`` tasks, so ``out_dir`` must be a
    filesystem every worker can reach (same contract as the lake).
    ``write_table(pa.Table, path)`` does the actual serialization.
    Returns ``{shard: rows_written}`` for THIS run; completed shards
    are reported as ``-1`` (skipped).
    """
    import json
    import tempfile

    import numpy as np
    import pyarrow as pa

    from ..ops.corpus import _md5_lower64_column

    if num_shards < 1:
        raise ValueError("sharded export needs num_shards >= 1")
    os.makedirs(out_dir, exist_ok=True)

    def _atomic(dest: str, write_fn) -> None:
        # "_" prefix: a crash-orphaned tmp must stay invisible to readers
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix="_tmp", suffix=".tmp")
        os.close(fd)
        try:
            write_fn(tmp)
            os.replace(tmp, dest)  # deterministic path => idempotent retry
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    # resume guard: .done names alone can't tell an 8-shard export from
    # a 16-shard one — resuming with different params would duplicate
    # rows silently, so the params are pinned in a meta file
    def _json_writer(payload):
        def w(tmp_path):
            with open(tmp_path, "w") as f:
                json.dump(payload, f)  # closed (flushed) before replace
        return w

    meta_path = os.path.join(out_dir, "_export_meta.json")
    meta = {"num_shards": num_shards, "id_col": id_col, "format": fmt}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        # exports written before the jsonl variant existed carry no
        # format key — they are all parquet
        prev.setdefault("format", "parquet")
        if prev != meta:
            raise ValueError(
                f"sharded export: {out_dir} was written with {prev}; "
                f"resuming with {meta} would corrupt the export"
            )
    else:
        _atomic(meta_path, _json_writer(meta))
    # sweep crash-orphaned tmps (a hard-killed worker's finally never ran)
    for name in os.listdir(out_dir):
        if name.startswith("_tmp") and name.endswith(".tmp"):
            os.remove(os.path.join(out_dir, name))
    done = {
        int(name[7:-5])
        for name in os.listdir(out_dir)
        if name.startswith("_shard=") and name.endswith(".done")
    }

    def shard_and_skip(batch: pa.Table) -> pa.Table:
        hv, _ = _md5_lower64_column(batch[id_col])
        sh = (hv % np.uint64(num_shards)).astype(np.int64)
        batch = batch.append_column("__shard", pa.array(sh, pa.int64()))
        if done:
            keep = ~np.isin(sh, np.fromiter(done, np.int64, len(done)))
            batch = batch.filter(pa.array(keep))
        return batch

    def write_shard(g: pa.Table) -> pa.Table:
        shard = g["__shard"][0].as_py()
        body = g.drop_columns(["__shard"])
        _atomic(
            os.path.join(out_dir, f"shard={shard:04d}.{fmt}"),
            lambda t: write_table(body, t),
        )
        _atomic(
            os.path.join(out_dir, f"_shard={shard:04d}.done"),
            _json_writer({"rows": body.num_rows}),
        )
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    written = (
        ds.map_batches(shard_and_skip, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    out = {s: -1 for s in done}
    for r in written:
        out[r["shard"]] = r["rows"]
    # shards no row hashed into are complete by definition — manifest
    # them from the driver so a rerun of a finished export is a no-op
    for s in range(num_shards):
        if s not in out:
            _atomic(
                os.path.join(out_dir, f"_shard={s:04d}.done"),
                _json_writer({"rows": 0}),
            )
            out[s] = 0
    return out
