"""Flattener (SURVEY §2.2 M4): nested structs -> underscore columns,
lists -> JSON strings, key normalization.

Reimplements server/schema/flattener.go:53-104 semantics on Arrow
batches: struct column `a` with child `b` becomes column `a_b`; list /
map columns are serialized to JSON strings (flattener.go:70-74); keys
are lowercased with `()$[]{}@!#%&,.;:^- ` and space replaced by `_`
(flattener.go:10-32,108-110). Also a JSON-string exploder for columns
that *contain* JSON objects (the schemaless-event case, S4).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..types import DataType, to_arrow

_KEY_RE = re.compile(r"[()\[\]{}$@!#%&,.;:^\-\s]")


def normalize_key(name: str) -> str:
    return _KEY_RE.sub("_", name.lower())


def _flatten_field(name: str, col: pa.ChunkedArray, out: dict[str, pa.ChunkedArray]):
    t = col.type
    if pa.types.is_struct(t):
        col = col.combine_chunks()
        for i in range(t.num_fields):
            child_name = f"{name}_{normalize_key(t.field(i).name)}"
            _flatten_field(child_name, pa.chunked_array([col.field(i)]), out)
    elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_map(t):
        vals = col.to_pylist()
        out[name] = pa.chunked_array(
            [pa.array([None if v is None else json.dumps(v) for v in vals], pa.string())]
        )
    else:
        out[name] = col


def flatten_struct_columns(batch: pa.Table) -> pa.Table:
    """map_batches stage: flatten all struct columns, JSON-serialize lists."""
    out: dict[str, pa.ChunkedArray] = {}
    for name, col in zip(batch.column_names, batch.columns):
        _flatten_field(normalize_key(name), col, out)
    return pa.table(out)


def flatten_json_object(obj: dict, prefix: str = "") -> dict:
    """Row-level dict flattener (used by the UDF transform path and tests);
    exact analog of the recursive Go flattener over map[string]interface{}."""
    out: dict = {}
    for k, v in obj.items():
        key = f"{prefix}{normalize_key(str(k))}"
        if isinstance(v, dict):
            out.update(flatten_json_object(v, key + "_"))
        elif isinstance(v, (list, tuple)):
            out[key] = json.dumps(list(v))
        elif v is None:
            continue  # nil values are dropped (flattener.go:64-66)
        else:
            out[key] = v
    return out


def explode_json_column(col: str, fields: dict[str, DataType]) -> "callable":
    """map_batches stage factory: parse a JSON-string column into typed
    columns `{col}_{field}` (flatten-on-read for schemaless props).

    Row loop by necessity (arbitrary JSON); keep off hot paths or wrap in
    an actor pool when the parse dominates.
    """

    def run(batch: pa.Table) -> pa.Table:
        raw = batch[col].to_pylist()
        parsed = [json.loads(v) if v else {} for v in raw]
        for f, t in fields.items():
            vals = [p.get(f) for p in parsed]
            batch = batch.append_column(
                f"{normalize_key(col)}_{normalize_key(f)}", pa.array(vals, to_arrow(t))
            )
        return batch

    return run
