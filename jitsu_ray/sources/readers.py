"""Event sources (SURVEY §2.1 S3-S5): NDJSON log files, CSV, parquet.

The reference ingests rotated NDJSON log files (1 line = 1 JSON event,
server/schema/processor.go:52-108) and CSV with header normalization +
per-column casts (server/parsers/csv.go:14-57). Here each source yields
a Ray Dataset of flattened, normalized event rows ready for the
transform chain; malformed lines go to the dead-letter channel instead
of failing the batch (fallback semantics, server/fallback/service.go).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..stages.flatten import flatten_json_object, normalize_key
from ..stages.transform import ERROR_COL, RAW_COL, TABLE_COL
from ..types import DataType, cast_array


def read_ndjson_events(paths, default_table: str = "events"):
    """NDJSON log source: read_text -> per-batch JSON parse + flatten.

    Output rows carry __table (default) plus flattened event fields;
    parse failures become dead-letter rows (__table="", __error set) —
    the fact_input_with_error_lines.log golden case.
    """

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch["text"].to_pylist():
            if not line or not line.strip():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("event must be a JSON object")
                flat = flatten_json_object(obj)
                flat[TABLE_COL] = default_table
                flat[ERROR_COL] = None
                flat[RAW_COL] = None
                rows.append(flat)
            except Exception as e:  # noqa: BLE001 - dead-letter anything
                rows.append(
                    {TABLE_COL: "", ERROR_COL: f"{type(e).__name__}: {e}", RAW_COL: line}
                )
        if not rows:
            return pa.table({TABLE_COL: pa.array([], pa.string())})
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        return pa.table({k: [r.get(k) for r in rows] for k in keys})

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def read_csv_events(paths, casts: dict[str, DataType] | None = None):
    """CSV source: normalized headers + declarative column casts
    (parsers/csv.go semantics: header reformat + cast funcs)."""
    ds = ray.data.read_csv(paths)

    def normalize(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns([normalize_key(c) for c in batch.column_names])
        if casts:
            for col, t in casts.items():
                if col in batch.column_names:
                    idx = batch.column_names.index(col)
                    batch = batch.set_column(idx, col, cast_array(batch[col], t))
        return batch

    return ds.map_batches(normalize, batch_format="pyarrow")


def read_changelog_parquet(path, lo: int | None = None, hi: int | None = None):
    """Primary CDC source (S1/S3 replacement): parquet change log,
    optionally windowed by commit_seq (pushdown)."""
    import pyarrow.compute as pc

    kw = {}
    if lo is not None and hi is not None:
        kw["filter"] = (pc.field("commit_seq") > lo) & (pc.field("commit_seq") <= hi)
    return ray.data.read_parquet(path, **kw)


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    if t.schema.metadata:
        t = t.replace_schema_metadata(None)
    return t


def read_parquet_clean(paths, **kw) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` + a fused schema-metadata strip.

    pyarrow 16's ``pa.Schema`` is unhashable when it carries metadata
    (``hash()`` raises on the metadata dict), so every block that keeps a
    writer's embedded ``b'pandas'``/ARROW:schema metadata makes Ray Data's
    ``unify_schemas`` fast-path dedup fail — one logged warning per concat
    in every downstream reduce/split task, plus the slow unify path. The
    strip is zero-copy (metadata-only table rebuild) and fuses into the
    read task, so metadata-free blocks enter the pipeline from the start.
    """
    return ray.data.read_parquet(paths, **kw).map_batches(
        _strip_schema_metadata, batch_format="pyarrow"
    )
