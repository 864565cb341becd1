"""Retrospective user recognition (SURVEY §2.3 T5).

The reference buffers anonymous events in a Redis index and, when an
``identify`` event maps anonymous_id -> user_id, re-emits UPDATEs for
the stored events (server/users/service.go:134-149,207-265). The batch
analog: build the anonymous->user mapping from the events that carry
both ids, broadcast it, and backfill the missing user ids in one
vectorized pass. Applied against the lake, the backfilled rows are just
a higher-commit_seq update window — LWW makes the rewrite exact.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Max


def build_identity_map(ds, anon_col: str, user_col: str) -> pa.Table:
    """(anonymous_id -> user_id) from rows where both are present.
    Conflicting identifies resolve to the max user id (deterministic;
    the reference takes the latest — pair with a seq column upstream for
    time-based resolution). Aggregation output is small: one row per
    anonymous id."""
    def pick(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[anon_col]), pc.is_valid(b[user_col]))
        return b.select([anon_col, user_col]).filter(m)

    pairs = ds.map_batches(pick, batch_format="pyarrow")
    agg = pairs.groupby(anon_col).aggregate(Max(user_col, alias_name=user_col))
    rows = agg.take_all()
    return pa.table(
        {
            anon_col: pa.array([r[anon_col] for r in rows]),
            user_col: pa.array([r[user_col] for r in rows]),
        }
    )


def recognize_users(ds, anon_col: str, user_col: str, id_map: pa.Table | None = None):
    """Backfill null ``user_col`` from the broadcast identity map."""
    if id_map is None:
        id_map = build_identity_map(ds, anon_col, user_col)
    ref = ray.put(dict(zip(id_map[anon_col].to_pylist(), id_map[user_col].to_pylist())))

    def backfill(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        mapping = once_per_process("recognize_users", _ref)
        users = batch[user_col].to_pylist()
        anons = batch[anon_col].to_pylist()
        filled = [
            u if u is not None else mapping.get(a) for u, a in zip(users, anons)
        ]
        idx = batch.column_names.index(user_col)
        return batch.set_column(
            idx, user_col, pa.array(filled, batch.schema.field(user_col).type)
        )

    return ds.map_batches(backfill, batch_format="pyarrow")
