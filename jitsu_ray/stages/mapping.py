"""Field-mapping DSL (SURVEY §2.2 M2): move / remove / cast / constant
over column paths, with keep_unmapped.

Reimplements server/schema/field_mapper.go:67-121 + mappings.go:12-16
as a compiler from declarative rules to one zero-copy Arrow batch
function. JSON paths `/a/b` address post-flatten columns `a_b`
(run the flattener first for nested inputs, as the reference's
MappingStep does: schema/mapping_step.go:24-41).

Rule forms (dicts, e.g. loaded from YAML/JSON config):
    {"action": "move",     "src": "/a/b", "dst": "/c"}
    {"action": "remove",   "src": "/a"}
    {"action": "cast",     "src": "/a",  "type": "int64"}
    {"action": "constant", "dst": "/x",  "value": 1}
Old-style strings "a -> (int64) b" are also accepted
(field_mapper.go:125-175).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pyarrow as pa

from ..types import DataType, cast_array
from .flatten import normalize_key

_OLD_STYLE = re.compile(r"^\s*(?P<src>/[^\s]*)?\s*->\s*(\((?P<type>\w+)\))?\s*(?P<dst>/[^\s]*)?\s*$")


def _path_to_col(path: str) -> str:
    return "_".join(normalize_key(p) for p in path.strip("/").split("/") if p)


def parse_rule(rule: dict | str) -> dict:
    if isinstance(rule, str):
        m = _OLD_STYLE.match(rule)
        if not m:
            raise ValueError(f"bad mapping rule: {rule!r}")
        src, dst, typ = m.group("src"), m.group("dst"), m.group("type")
        out: dict = {"action": "remove" if not dst else "move", "src": src, "dst": dst}
        if typ:
            out["type"] = typ
        return out
    return dict(rule)


def compile_mapping(
    rules: list[dict | str], keep_unmapped: bool = True
) -> Callable[[pa.Table], pa.Table]:
    """Compile rules into a single `pa.Table -> pa.Table` stage."""
    parsed = [parse_rule(r) for r in rules]

    def run(batch: pa.Table) -> pa.Table:
        touched: set[str] = set()
        produced: list[str] = []
        for r in parsed:
            action = r["action"]
            src = _path_to_col(r["src"]) if r.get("src") else None
            dst = _path_to_col(r["dst"]) if r.get("dst") else None
            if action == "remove":
                if src in batch.column_names:
                    batch = batch.drop_columns([src])
                touched.add(src)
                continue
            if action == "constant":
                arr = pa.array([r["value"]] * batch.num_rows)
                if "type" in r:
                    arr = cast_array(arr, DataType[r["type"].upper()])
                batch = _set(batch, dst, arr)
                produced.append(dst)
                continue
            if src not in batch.column_names:
                continue  # absent source: rule is a no-op, like the reference
            col = batch[src]
            if "type" in r or action == "cast":
                col = cast_array(col, DataType[r["type"].upper()])
            if action == "cast":
                batch = _set(batch, src, col)
                produced.append(src)
            elif action == "move":
                batch = batch.drop_columns([src])
                batch = _set(batch, dst, col)
                touched.add(src)
                produced.append(dst)
            else:
                raise ValueError(f"unknown mapping action {action!r}")
        if not keep_unmapped:
            keep = [c for c in batch.column_names if c in set(produced)]
            batch = batch.select(keep)
        return batch

    return run


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)
