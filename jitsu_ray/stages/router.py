"""Table routing + multiplexing (SURVEY §2.2 M6/M7).

Reimplements the table-name extractor (server/schema/
table_name_extractor.go:33-66): a template / callable computes each
row's destination table; rows whose name resolves empty are SKIPPED
(schema/processor.go:17,144-151). Multi-destination fan-out
(handlers/event.go:97-115, destinations/service.go:111-117) becomes
cheap pre-execution Dataset forks.

Templates are Python format strings over column names
(`"{lang}_events"`), the analog of the reference's Go text/template
`{{.lang}}_events`; a callable `(pa.Table) -> pa.Array[str]` covers
anything fancier (the planned-JS-transform routing contract).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

TABLE_COL = "__table"

_FIELD_RE = re.compile(r"\{(\w+)\}")


def compile_template(template: str) -> Callable[[pa.Table], pa.Array]:
    """Vectorize a `"{col}_suffix"` format template to an Arrow expression:
    literal segments + column refs concatenated per row (nulls -> "")."""
    fields = _FIELD_RE.findall(template)
    parts = _FIELD_RE.split(template)  # [lit, field, lit, field, ..., lit]

    def run(batch: pa.Table) -> pa.Array:
        arrays = []
        for i, p in enumerate(parts):
            if i % 2 == 0:
                if p:
                    arrays.append(pa.array([p] * batch.num_rows, pa.string()))
            else:
                col = pc.cast(batch[p], pa.string())
                arrays.append(pc.fill_null(col, ""))
        if not arrays:
            return pa.array([""] * batch.num_rows, pa.string())
        out = arrays[0]
        for a in arrays[1:]:
            out = pc.binary_join_element_wise(out, a, "")
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out

    _ = fields
    return run


def route_stage(
    router: str | Callable[[pa.Table], pa.Array], drop_unrouted: bool = True
) -> Callable[[pa.Table], pa.Table]:
    """map_batches stage: add __table; drop rows routing to "" (the
    reference's ErrTableNameParse skip)."""
    fn = compile_template(router) if isinstance(router, str) else router

    def run(batch: pa.Table) -> pa.Table:
        names = fn(batch)
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        batch = batch.append_column(TABLE_COL, pc.fill_null(names, ""))
        if drop_unrouted:
            batch = batch.filter(pc.not_equal(batch[TABLE_COL], ""))
        return batch

    return run


def fan_out(ds, tables: list[str]):
    """Multiplexer: one routed Dataset -> {table: filtered Dataset}.
    Datasets are lazy, so each fork re-reads only at its own execution;
    for a small known table set this is the Ray-idiomatic multi-sink."""
    out = {}
    for t in tables:
        out[t] = ds.map_batches(
            lambda b, _t=t: b.filter(pc.equal(b[TABLE_COL], _t)),
            batch_format="pyarrow",
        )
    return out


def skip_already_uploaded(done_ids: set) -> Callable[[pa.Table], pa.Table]:
    """M8/J4 anti-join: drop rows whose window/id is already committed —
    broadcast the (small) committed-id set, filter per batch."""

    def run(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["window_id"], value_set=pa.array(list(done_ids))))
        return batch.filter(mask)

    return run
