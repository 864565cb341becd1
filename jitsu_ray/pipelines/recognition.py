"""Retrospective user recognition (SURVEY §2.3 T5).

The reference buffers anonymous events in a Redis index and, when an
``identify`` event maps anonymous_id -> user_id, re-emits UPDATEs for
the stored events (server/users/service.go:134-149,207-265). The batch
analog: build the anonymous->user mapping from the events that carry
both ids and backfill the missing user ids in one vectorized pass.
Applied against the lake, the backfilled rows are just a higher-
commit_seq update window — LWW makes the rewrite exact.

Scale shape (round-2 verdict #3): the identity map has one row per
anonymous id, which in real event streams grows with the corpus — an
unguarded driver materialization is a scale-killer. ``recognize_users``
therefore mirrors ``ops.dedup.verify_pairs``: the aggregated map stays
a (materialized, distributed) Dataset; when its byte size fits the
per-worker broadcast budget it is pulled once and broadcast via
``ray.put`` (backfill = two vectorized Arrow kernels per batch, no
shuffle), otherwise it falls back to a ``bucket_hash_join`` on the
anonymous id — one shuffle, never a driver copy.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Max

MAPPED_COL = "__mapped_user"


def build_identity_map_ds(ds, anon_col: str, user_col: str):
    """(anonymous_id -> user_id) as a MATERIALIZED Dataset, one row per
    anonymous id. Conflicting identifies resolve to the max user id
    (deterministic; the reference takes the latest — pair with a seq
    column upstream for time-based resolution)."""

    def pick(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[anon_col]), pc.is_valid(b[user_col]))
        return b.select([anon_col, user_col]).filter(m)

    pairs = ds.map_batches(pick, batch_format="pyarrow")
    return pairs.groupby(anon_col).aggregate(Max(user_col, alias_name=user_col)).materialize()


def build_identity_map(ds, anon_col: str, user_col: str) -> pa.Table:
    """Driver-side identity map table — only for maps known to be small
    (tests, interactive use); the pipeline path never calls this."""
    rows = build_identity_map_ds(ds, anon_col, user_col).take_all()
    return pa.table(
        {
            anon_col: pa.array([r[anon_col] for r in rows]),
            user_col: pa.array([r[user_col] for r in rows]),
        }
    )


def _broadcast_backfill(ds, anon_col: str, user_col: str, id_map: pa.Table):
    if id_map.num_rows == 0:
        # nothing to backfill; also dodges pa.array([])'s null-typed
        # value set, which index_in rejects against a typed column
        return ds
    keys = id_map[anon_col].combine_chunks()
    vals = id_map[user_col].combine_chunks()
    ref = ray.put((keys, vals))

    def backfill(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        ks, vs = once_per_process("recognize_users", _ref)
        # order-preserving vectorized lookup: position of each anon id in
        # the map (null for misses), gather, then coalesce into user_col
        pos = pc.index_in(batch[anon_col], value_set=ks)
        mapped = vs.take(pos)
        field = batch.schema.field(user_col)
        filled = pc.coalesce(batch[user_col], mapped.cast(field.type))
        idx = batch.column_names.index(user_col)
        return batch.set_column(idx, user_col, filled)

    return ds.map_batches(backfill, batch_format="pyarrow")


def recognize_users(
    ds,
    anon_col: str,
    user_col: str,
    id_map: pa.Table | None = None,
    broadcast_limit_bytes: int = 64 << 20,
    num_buckets: int = 32,
):
    """Backfill null ``user_col`` from the identity map.

    With an explicit ``id_map`` table the caller owns the size question
    and the broadcast path is used directly. Otherwise the map is built
    distributed and the broadcast-vs-join routing is decided by its
    materialized byte size against ``broadcast_limit_bytes`` (a
    per-WORKER heap budget: warm-worker tasks cache one deserialized
    copy per process)."""
    if id_map is not None:
        return _broadcast_backfill(ds, anon_col, user_col, id_map)

    map_ds = build_identity_map_ds(ds, anon_col, user_col)
    approx_bytes = map_ds.size_bytes() or 0
    if approx_bytes <= broadcast_limit_bytes:
        rows = map_ds.take_all()
        tbl = pa.table(
            {
                anon_col: pa.array([r[anon_col] for r in rows]),
                user_col: pa.array([r[user_col] for r in rows]),
            }
        )
        return _broadcast_backfill(ds, anon_col, user_col, tbl)

    # big-map path: left-outer bucket join on the anonymous id, then a
    # vectorized coalesce — one shuffle, the map never lands driver-side
    from ..ops.join import bucket_hash_join

    def to_mapped(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([anon_col, MAPPED_COL])

    mapped_ds = map_ds.map_batches(to_mapped, batch_format="pyarrow")
    joined = bucket_hash_join(
        ds, mapped_ds, anon_col, anon_col,
        num_buckets=num_buckets, how="left outer",
    )

    def fold(batch: pa.Table) -> pa.Table:
        field = batch.schema.field(user_col)
        filled = pc.coalesce(batch[user_col], batch[MAPPED_COL].cast(field.type))
        idx = batch.column_names.index(user_col)
        return batch.set_column(idx, user_col, filled).drop_columns([MAPPED_COL])

    return joined.map_batches(fold, batch_format="pyarrow")
