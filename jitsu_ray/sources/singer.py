"""Singer bridge (SURVEY §2.1 S7): ingest Singer-tap output streams.

The reference shells out to Python Singer taps and bridges their stdout
protocol into events (server/drivers/singer.go:26-80). The protocol
itself is public (singer.io spec): newline-delimited JSON messages —
``SCHEMA`` (per-stream JSON schema + key_properties), ``RECORD`` (one
row), ``STATE`` (opaque checkpoint to persist and replay into the next
run). This bridge parses tap output — a file that a tap already wrote,
or a live subprocess — into one Ray Dataset per stream plus the final
state for checkpointing.

Ray-first shape: RECORD lines are the bulk and parse distributed
(``read_text`` -> ``map_batches``); SCHEMA/STATE lines are rare and
small, collected with a filtered pass (dataset row order follows file
order, so "last STATE" is well-defined). Schema types map onto the
engine's logical lattice, so downstream widening/casting behaves like
any other source.
"""

from __future__ import annotations

import json
import subprocess
import tempfile
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import ray.data

from ..stages.flatten import flatten_json_object
from ..types import DataType, cast_array


def _jsonschema_to_logical(prop: dict) -> DataType:
    t = prop.get("type", "string")
    if isinstance(t, list):  # ["null", "integer"] nullability idiom
        t = next((x for x in t if x != "null"), "string")
    if t == "integer":
        return DataType.INT64
    if t == "number":
        return DataType.FLOAT64
    if t == "boolean":
        return DataType.BOOL
    if t == "string" and prop.get("format") == "date-time":
        return DataType.TIMESTAMP
    return DataType.STRING


@dataclass
class SingerOutput:
    streams: dict[str, Any] = field(default_factory=dict)  # stream -> Dataset
    schemas: dict[str, dict] = field(default_factory=dict)
    key_properties: dict[str, list[str]] = field(default_factory=dict)
    state: dict | None = None


def read_singer_output(paths) -> SingerOutput:
    """Parse Singer-protocol NDJSON file(s) into per-stream Datasets +
    the final STATE (persist it; pass back to the tap on the next run —
    the reference stores it in its meta storage)."""
    raw = ray.data.read_text(paths)

    # small control-plane pass: SCHEMA + STATE lines only. Reduced PER
    # BATCH so the driver fold stays bounded even against a tap that
    # emits STATE every few records (common checkpointing style): one
    # SCHEMA per stream per batch + only the batch's LAST STATE — map
    # output order is preserved, so the last surviving STATE is still
    # the global last.
    def control(batch: pa.Table) -> pa.Table:
        schema_by_stream: dict = {}
        last_state = None
        for line in batch["text"].to_pylist():
            s = (line or "").strip()
            if not s:
                continue
            # cheap prefilter before full JSON parse
            if '"SCHEMA"' in s or '"STATE"' in s:
                try:
                    obj = json.loads(s)
                except Exception:
                    continue
                if obj.get("type") == "SCHEMA":
                    # last SCHEMA per stream wins (schema evolution mid-run)
                    schema_by_stream[obj.get("stream")] = s
                elif obj.get("type") == "STATE":
                    last_state = s
        keep = list(schema_by_stream.values())
        if last_state is not None:
            keep.append(last_state)
        return pa.table({"text": pa.array(keep, pa.string())})

    out = SingerOutput()
    # "last STATE wins" requires block order = input order; Ray's
    # streaming executor emits blocks in task-completion order unless
    # preserve_order is set, and the per-batch reduction above discards
    # non-last STATEs, so a misordering would be unrecoverable
    ctx = ray.data.DataContext.get_current()
    prev_order = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        control_lines = raw.map_batches(control, batch_format="pyarrow").take_all()
    finally:
        ctx.execution_options.preserve_order = prev_order
    for line in control_lines:
        obj = json.loads(line["text"])
        if obj["type"] == "SCHEMA":
            out.schemas[obj["stream"]] = obj.get("schema", {})
            out.key_properties[obj["stream"]] = obj.get("key_properties", [])
        else:  # STATE — dataset order follows file order; last one wins
            out.state = obj.get("value")

    for stream, schema in out.schemas.items():
        props = schema.get("properties", {})
        casts = {k: _jsonschema_to_logical(v) for k, v in props.items()}

        def parse(batch: pa.Table, _stream=stream, _casts=casts) -> pa.Table:
            rows = []
            for line in batch["text"].to_pylist():
                s = (line or "").strip()
                if not s or '"RECORD"' not in s:
                    continue
                try:
                    obj = json.loads(s)
                except Exception:
                    continue
                if obj.get("type") != "RECORD" or obj.get("stream") != _stream:
                    continue
                rows.append(flatten_json_object(obj.get("record", {})))
            if not rows:
                # typed empties: a block with no matching RECORDs must
                # still carry the CAST schema or Dataset schema
                # unification breaks against non-empty blocks
                from ..types import to_arrow

                if _casts:
                    return pa.table(
                        {k: pa.array([], to_arrow(t)) for k, t in _casts.items()}
                    )
                return pa.table({"__empty": pa.array([], pa.int8())})
            keys = list(_casts) + [k for r in rows for k in r if k not in _casts]
            seen: list[str] = []
            for k in keys:
                if k not in seen:
                    seen.append(k)
            tbl = pa.table({k: [r.get(k) for r in rows] for k in seen})
            for col, t in _casts.items():
                if col in tbl.column_names:
                    idx = tbl.column_names.index(col)
                    tbl = tbl.set_column(idx, col, cast_array(tbl[col], t))
            return tbl

        out.streams[stream] = raw.map_batches(parse, batch_format="pyarrow")
    return out


def run_tap(cmd: list[str], state: dict | None = None, config: dict | None = None,
            timeout_sec: float = 300.0) -> SingerOutput:
    """Run a Singer tap subprocess (singer.go's bridge): optional
    --config/--state temp files, stdout captured to a spool file, then
    parsed with read_singer_output. Local-subprocess only — the tap
    binary must already be installed."""
    cmd = list(cmd)
    tmpdir = tempfile.mkdtemp(prefix="singer_")
    if config is not None:
        cfg = f"{tmpdir}/config.json"
        with open(cfg, "w") as f:
            json.dump(config, f)
        cmd += ["--config", cfg]
    if state is not None:
        st = f"{tmpdir}/state.json"
        with open(st, "w") as f:
            json.dump(state, f)
        cmd += ["--state", st]
    spool = f"{tmpdir}/out.ndjson"
    with open(spool, "w") as out_f:
        subprocess.run(cmd, stdout=out_f, timeout=timeout_sec, check=True)
    return read_singer_output([spool])
