"""Enrichment stages (SURVEY §2.2 M1/M9, §2.3 T3).

Reimplements the reference's ContextEnrichmentStep
(server/enrichment/context_enrichment_step.go:17-34): constant context
columns, deterministic timestamps, deterministic event ids — and the
PII sha256 normalizer (server/adapters/facebook_conversion_api.go:260-289).

All stages are `pa.Table -> pa.Table` callables for
``ds.map_batches(stage, batch_format="pyarrow")``; compose with
``chain``. Determinism rule (FIXTURES.md): no wall clock, no random
uuids — `_timestamp` derives from commit_seq, event ids from key
columns (analog of uuid.GetKeysHash, server/uuid/uuid.go:36-46).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..util import md5_hex_column

Stage = Callable[[pa.Table], pa.Table]

# epoch base for synthetic event time: 2024-01-01T00:00:00Z in epoch micros
_BASE_US = 1_704_067_200_000_000


def chain(*stages: Stage) -> Stage:
    def run(batch: pa.Table) -> pa.Table:
        for s in stages:
            batch = s(batch)
        return batch

    return run


def add_constant(name: str, value, dtype: pa.DataType | None = None) -> Stage:
    """Constant context column (api_key / src markers — M1, S2)."""

    def run(batch: pa.Table) -> pa.Table:
        arr = pa.nulls(batch.num_rows, dtype) if value is None else pa.array(
            [value] * batch.num_rows, dtype
        )
        return _set(batch, name, arr)

    return run


def add_timestamp(seq_col: str = "commit_seq", out: str = "_timestamp") -> Stage:
    """Deterministic event time derived from commit order (one second per
    seq step past a fixed epoch) — replaces timestamp.NowUTC() in the
    reference's enricher, which would break replay equality."""

    def run(batch: pa.Table) -> pa.Table:
        us = pc.add(pc.multiply(pc.cast(batch[seq_col], pa.int64()), 1_000_000), _BASE_US)
        return _set(batch, out, pc.cast(us, pa.timestamp("us")))

    return run


def add_event_id(cols: list[str], out: str = "event_id") -> Stage:
    """Deterministic md5-of-key-values event id (uuid/uuid.go:36-46).

    Row-at-a-time md5; optional on the hot path — the lake dedups on
    (key, commit_seq) directly, which this id is a pure function of.
    """
    cols = sorted(cols)  # GetKeysHash sorts key fields

    def run(batch: pa.Table) -> pa.Table:
        return _set(batch, out, md5_hex_column(*[batch[c] for c in cols]))

    return run


def hash_pii(cols: list[str], suffix: str = "") -> Stage:
    """lowercase+trim then sha256 — the FB Conversions normalizer
    (facebook_conversion_api.go:260-289). Overwrites in place unless a
    suffix is given."""

    def run(batch: pa.Table) -> pa.Table:
        for c in cols:
            norm = pc.utf8_trim_whitespace(pc.utf8_lower(pc.cast(batch[c], pa.string())))
            hashed = pa.array(
                [
                    None if v is None else hashlib.sha256(v.encode()).hexdigest()
                    for v in norm.to_pylist()
                ],
                pa.string(),
            )
            batch = _set(batch, c + suffix, hashed)
        return batch

    return run


def when(cond: Callable[[pa.Table], pa.ChunkedArray | pa.Array], stage: Stage) -> Stage:
    """Conditional enrichment (the reference skips default rules when
    src == "api" — server/enrichment/default.go:16-33). Rows failing the
    condition pass through unchanged."""

    def run(batch: pa.Table) -> pa.Table:
        mask = cond(batch)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        yes = batch.filter(mask)
        no = batch.filter(pc.invert(mask))
        out = stage(yes)
        # align schemas (stage may add columns; untouched rows get null)
        for f in out.schema:
            if f.name not in no.column_names:
                no = no.append_column(f, pa.nulls(no.num_rows, f.type))
        return pa.concat_tables([out, no.select(out.column_names)], promote_options="permissive")

    return run


# -- enricher registry (server/enrichment/rule.go:15-38 analog) -------------

_REGISTRY: dict[str, Callable[..., Stage]] = {}


def register_enricher(name: str, factory: Callable[..., Stage]) -> None:
    _REGISTRY[name] = factory


def make_enricher(name: str, **kw) -> Stage:
    return _REGISTRY[name](**kw)


register_enricher("constant", add_constant)
register_enricher("timestamp", add_timestamp)
register_enricher("event_id", add_event_id)
register_enricher("hash_pii", hash_pii)


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)
