"""Join / lookup operators (SURVEY §2.4).

The reference has no general relational join — its join-like shapes are
broadcast dictionary lookups (J1: geo/UA), keyed point lookups (J2:
anonymous→user), PK upsert merges (J3, the lake), and manifest
anti-joins (J4). We provide the two idiomatic Ray Data realizations:

- ``broadcast_join``: small side ``ray.put`` once, looked up inside
  ``map_batches`` per batch (J1/J2 shape; no shuffle).
- ``bucket_hash_join``: both sides large — add ``bucket = hash(key)%B``
  to both, group each by bucket, join matching buckets pairwise inside
  ``map_groups``. Partitioning assumption: per-bucket slices of both
  sides fit in one task's memory; skewed keys are salted into
  sub-buckets by raising B (documented in the ray_guide join recipe).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import hash_mod_column


def broadcast_join(
    ds,
    small: pa.Table,
    key: str,
    value_cols: list[str],
    how: str = "inner",
):
    """Join a Dataset against a small broadcast table on one key column.

    ``small`` is put in the object store ONCE; each map task (or actor)
    fetches it once and joins per batch with Arrow's hash join.
    """
    ref = ray.put(small.select([key] + value_cols))

    def run(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        tbl = once_per_process("broadcast_join", _ref)
        return batch.join(tbl, keys=key, join_type=how)

    # plain tasks + per-process cached broadcast: no actor-pool startup
    return ds.map_batches(run, batch_format="pyarrow")


def semi_anti_filter(ds, keys: pa.Array, col: str, anti: bool = False):
    """J4 shape: semi / anti join via a broadcast key set."""
    ref = ray.put(keys)

    def run(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        ks = once_per_process("semi_anti_filter", _ref)
        m = pc.is_in(batch[col], value_set=ks)
        return batch.filter(pc.invert(m) if anti else m)

    return ds.map_batches(run, batch_format="pyarrow")


def _tag_stage(side: int, key: str | list[str], union_fields, num_buckets: int):
    """Shared tagging half of the bucket joins: pad a batch to the union
    schema, add __bucket (hash of the key column(s) — value-based, so
    the two sides may use different key NAMES) and __side columns."""
    key_cols = [key] if isinstance(key, str) else list(key)

    def run(batch: pa.Table) -> pa.Table:
        b = hash_mod_column(batch, key_cols, num_buckets)
        cols = {}
        for f in union_fields:
            if f.name in batch.column_names:
                col = batch[f.name]
                cols[f.name] = col.cast(f.type) if not col.type.equals(f.type) else col
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        out = pa.table(cols)
        out = out.append_column("__bucket", b)
        return out.append_column(
            "__side", pa.array([side] * batch.num_rows, pa.int8())
        )

    return run


def bucket_asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 32,
    right_pre_join=None,
):
    """Distributed backward as-of join: each left row picks the right
    row with the greatest ``right_ts`` <= its ``left_ts`` for the same
    ``key`` (DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >=
    r.ts`` semantics; unmatched left rows keep nulls).

    Same one-shuffle shape as bucket_hash_join: both sides tagged and
    bucketed by key hash, ONE union groupby co-locates each bucket, and
    the per-bucket combine is polars ``join_asof`` (sorted backward
    search, vectorized across the bucket's keys). Partitioning
    assumption: a bucket's rows from both sides fit one task — raise
    ``num_buckets`` for bigger sides. ``right_pre_join`` runs on the
    right slice inside the bucket (bucketing by key guarantees it sees
    every row of its keys — e.g. per-(key, ts) pre-aggregation)."""
    import polars as pl

    l_schema = left.schema()
    r_schema = right.schema()
    if l_schema is None:
        return left  # zero-block left: the as-of result is empty anyway
    if r_schema is None:
        raise ValueError(
            "cannot as-of-join against an empty schema-less right side "
            "(the null-padded right columns are unknowable)"
        )
    l_schema = l_schema.base_schema
    r_schema = r_schema.base_schema
    l_names = [f.name for f in l_schema]
    r_names = [f.name for f in r_schema]
    overlap = (set(l_names) & set(r_names)) - {key}
    if overlap:
        raise ValueError(f"non-key column overlap in asof join: {overlap}")
    union_fields = list(l_schema) + [f for f in r_schema if f.name not in l_names]
    out_schema = pa.schema(
        list(l_schema) + [f for f in r_schema if f.name not in (key, right_ts)]
    )

    lt = left.map_batches(
        _tag_stage(0, key, union_fields, num_buckets), batch_format="pyarrow"
    )
    rt = right.map_batches(
        _tag_stage(1, key, union_fields, num_buckets), batch_format="pyarrow"
    )

    def asof_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group["__side"], 0)
        lg = group.filter(mask).select(l_names)
        rg = group.filter(pc.invert(mask)).select(r_names)
        if right_pre_join is not None:
            rg = right_pre_join(rg)
        ldf = pl.from_arrow(lg).sort(left_ts)
        rdf = pl.from_arrow(rg).sort(right_ts)
        out = ldf.join_asof(
            rdf,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            strategy="backward",
            # both frames sorted on their ts two lines up; skipping the
            # check also silences the per-task sortedness UserWarning
            check_sortedness=False,
        )
        return out.to_arrow().select(out_schema.names).cast(out_schema)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(asof_bucket, batch_format="pyarrow")


def bucket_hash_join(
    left,
    right,
    left_key: str | list[str],
    right_key: str | list[str],
    num_buckets: int = 32,
    how: str = "inner",
    right_pre_join=None,
    salt: int = 1,
):
    """Partitioned hash join of two Datasets (single- or multi-column
    keys — pass matching-length lists; bucketing hashes the tuple).

    Both sides get a ``__bucket`` column and are unioned with a side
    tag; one groupby co-locates each bucket's rows from both sides, and
    ``map_groups`` performs the per-bucket Arrow join. One shuffle total
    (the union groupby) instead of two.

    ``right_pre_join``: optional ``pa.Table -> pa.Table`` applied to the
    RIGHT side's slice inside each bucket before the join — the fused
    aggregate-then-join shape (e.g. per-key partial sums folded to one
    row per key without a separate global groupby shuffle). Bucketing
    by key guarantees the transform sees every row of its keys.

    ``salt``: SKEW handling. With ``salt=K > 1`` each key's bucket is
    split K ways: left rows scatter across their key's K salted buckets
    (round-robin within the batch — placement only, results are
    order-independent), and right rows are REPLICATED into all K, so a
    hot key's join work runs as K parallel tasks instead of one
    monster bucket. Costs K x the right side's shuffle bytes — use for
    a skewed BIG left side against a small-ish right (the canonical
    fact-x-dimension skew). Left-preserving joins only (each left row
    lives in exactly one salted bucket; a right row is seen K times,
    so 'right outer' / 'full outer' would duplicate right-unmatched
    rows — rejected). ``right_pre_join`` still sees every row of its
    keys inside each salted bucket (replication copies all of them).
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and how not in ("inner", "left outer", "left semi", "left anti"):
        raise ValueError(
            f"salt > 1 supports left-preserving joins only, got how={how!r} "
            "(right rows are replicated per salt bucket)"
        )

    lk = [left_key] if isinstance(left_key, str) else list(left_key)
    rk = [right_key] if isinstance(right_key, str) else list(right_key)
    if len(lk) != len(rk):
        raise ValueError(f"key arity mismatch: {lk} vs {rk}")
    l_schema = left.schema()
    r_schema = right.schema()
    # a zero-BLOCK side (e.g. a map over an empty lake read) has no
    # schema at all; the join is degenerate there, and dereferencing
    # .base_schema would crash on legal empty input
    if l_schema is None:
        return left  # 0 rows under every left-preserving shape
    if r_schema is None:
        if how == "left anti":
            return left
        if how in ("inner", "left semi"):
            return left.limit(0)
        raise ValueError(
            f"cannot {how}-join against an empty schema-less right side "
            "(its columns are unknowable)"
        )
    l_schema = l_schema.base_schema
    r_schema = r_schema.base_schema
    l_names = [f.name for f in l_schema]
    r_names = [f.name for f in r_schema]
    overlap = (set(l_names) & set(r_names)) - set(lk)
    if overlap:
        raise ValueError(f"non-key column overlap in bucket join: {overlap}")
    # union schema both tagged sides are padded to (union() needs it uniform)
    union_fields = list(l_schema) + [f for f in r_schema if f.name not in l_names]

    lt = left.map_batches(
        _tag_stage(0, left_key, union_fields, num_buckets), batch_format="pyarrow"
    )
    rt = right.map_batches(
        _tag_stage(1, right_key, union_fields, num_buckets), batch_format="pyarrow"
    )
    if salt > 1:
        import numpy as np

        def scatter_left(batch: pa.Table) -> pa.Table:
            b = batch["__bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = np.arange(len(b), dtype=np.int64) % salt
            return batch.set_column(
                batch.schema.get_field_index("__bucket"),
                "__bucket",
                pa.array(b * salt + s, batch["__bucket"].type),
            )

        def replicate_right(batch: pa.Table) -> pa.Table:
            b = batch["__bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            out = []
            for s in range(salt):
                out.append(
                    batch.set_column(
                        batch.schema.get_field_index("__bucket"),
                        "__bucket",
                        pa.array(b * salt + s, batch["__bucket"].type),
                    )
                )
            return pa.concat_tables(out)

        lt = lt.map_batches(scatter_left, batch_format="pyarrow")
        rt = rt.map_batches(replicate_right, batch_format="pyarrow")

    def join_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group["__side"], 0)
        lg = group.filter(mask).select(l_names)
        rg = group.filter(pc.invert(mask)).select(r_names)
        if right_pre_join is not None:
            rg = right_pre_join(rg)
        # arrow's hash join handles empty sides with the correct schema
        return lg.join(rg, keys=lk, right_keys=rk, join_type=how)

    # union of tagged sides -> ONE shuffle on __bucket co-locates both
    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def interval_join(
    facts,
    intervals: pa.Table,
    point_col: str,
    lo_col: str,
    hi_col: str,
    mode: str = "auto",
    bucket_width: int | None = None,
    broadcast_limit: int = 64 << 20,
):
    """Generic range join: each fact row pairs with EVERY interval row
    satisfying ``lo <= point < hi`` (many-to-many; overlapping intervals
    supported). Inner join; output = fact columns + interval columns.
    Temporal columns compare natively; bucketing uses their int64 (µs)
    value, so ``bucket_width`` for timestamps is in microseconds.

    Two physical plans (the J1-vs-J4 split applied to ranges):

    - ``broadcast`` (interval table under ``broadcast_limit`` bytes):
      ``ray.put`` once, per-batch vectorized inequality join (polars
      ``join_where``) — no shuffle; the geo-IP shape generalized to
      arbitrary, possibly overlapping intervals.
    - ``bucketed`` (large interval side): facts land in bucket
      ``point // bucket_width``; each interval replicates into every
      bucket its span overlaps (fan-out = span/bucket_width + 1 — pick
      a width near the median span); ONE union groupby co-locates each
      bucket and a per-bucket ``join_where`` applies the exact
      predicate. Partitioning assumption: a bucket's rows from both
      sides fit one task; a hot bucket is split by lowering
      ``bucket_width``.

    ``mode='auto'`` picks broadcast under the limit, else bucketed
    (which then requires ``bucket_width``).
    """
    import numpy as np
    import polars as pl

    f_schema = facts.schema().base_schema
    i_names = intervals.column_names
    overlap = set(f_schema.names) & set(i_names)
    if overlap:
        raise ValueError(f"column overlap in interval join: {overlap}")
    out_schema = pa.schema(list(f_schema) + list(intervals.schema))

    if mode == "auto":
        mode = "broadcast" if intervals.nbytes <= broadcast_limit else "bucketed"

    def pair(ldf: pl.DataFrame, rdf: pl.DataFrame) -> pa.Table:
        if ldf.height == 0 or rdf.height == 0:
            return out_schema.empty_table()
        out = ldf.join_where(
            rdf,
            pl.col(point_col) >= pl.col(lo_col),
            pl.col(point_col) < pl.col(hi_col),
        )
        return out.to_arrow().select(out_schema.names).cast(out_schema)

    if mode == "broadcast":
        ref = ray.put(intervals)

        def run(batch: pa.Table, _ref=ref) -> pa.Table:
            from ..util import once_per_process

            rdf = once_per_process("interval_join", _ref, build=pl.from_arrow)
            return pair(pl.from_arrow(batch), rdf)

        return facts.map_batches(run, batch_format="pyarrow")

    if mode != "bucketed":
        raise ValueError(f"unknown interval_join mode: {mode}")
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucketed interval_join requires a positive bucket_width")

    union_fields = list(f_schema) + list(intervals.schema)

    def _as_i64(col) -> np.ndarray:
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pc.cast(c, pa.int64()).to_numpy(zero_copy_only=False)

    def _pad(batch: pa.Table, side: int, bucket: np.ndarray) -> pa.Table:
        cols = {}
        for f in union_fields:
            if f.name in batch.column_names:
                cols[f.name] = batch[f.name]
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        out = pa.table(cols)
        out = out.append_column("__bucket", pa.array(bucket, pa.int64()))
        return out.append_column("__side", pa.array([side] * batch.num_rows, pa.int8()))

    def tag_facts(batch: pa.Table) -> pa.Table:
        # Inner-join semantics: a null point can never satisfy the range
        # predicate, so drop it here — matching the broadcast plan, where
        # join_where discards null comparisons (a null would otherwise
        # become NaN under to_numpy and crash the int64 bucket cast).
        batch = batch.filter(pc.is_valid(batch[point_col]))
        return _pad(batch, 0, _as_i64(batch[point_col]) // bucket_width)

    def fan_intervals(batch: pa.Table) -> pa.Table:
        # Same null contract as tag_facts: null lo/hi intervals match nothing.
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[lo_col]), pc.is_valid(batch[hi_col]))
        )
        lo = _as_i64(batch[lo_col]) // bucket_width
        # hi is exclusive: an interval touching a bucket boundary exactly
        # does not reach the next bucket
        hi = (_as_i64(batch[hi_col]) - 1) // bucket_width
        counts = np.maximum(hi - lo + 1, 0)
        idx = np.repeat(np.arange(batch.num_rows), counts)
        ends = np.cumsum(counts)
        offsets = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - counts, counts
        )
        return _pad(batch.take(pa.array(idx)), 1, lo[idx] + offsets)

    import ray.data as _rd

    ft = facts.map_batches(tag_facts, batch_format="pyarrow")
    it = _rd.from_arrow(intervals).map_batches(
        fan_intervals, batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group["__side"], 0)
        lg = group.filter(mask).select(f_schema.names)
        rg = group.filter(pc.invert(mask)).select(i_names)
        return pair(pl.from_arrow(lg), pl.from_arrow(rg))

    return ft.union(it).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def temporal_join(
    facts,
    dim,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
    num_buckets: int = 32,
):
    """Point-in-time join against an SCD2 version table (the
    feature-store training-data primitive): each fact row picks the
    dimension VERSION whose ``[valid_from, valid_to)`` interval contains
    its ``ts_col`` — including the gap semantics a plain backward as-of
    join gets WRONG: a fact landing after a delete closed the last
    version (and before any re-insert) matches NOTHING, where as-of
    would leak the deleted version into the training row (label
    leakage). LEFT semantics: unmatched facts keep null dim columns.

    Same ONE-shuffle shape as bucket_asof_join, generalized to
    composite keys: both sides tagged and bucketed by the key hash, one
    union groupby co-locates each bucket, per-bucket polars
    ``join_asof`` on ``valid_from`` (SCD2 intervals are per-key
    non-overlapping and sorted, so backward as-of finds the only
    candidate) followed by a vectorized interval post-filter that nulls
    every dim column where ``ts >= valid_to``. ``ts_col`` and
    ``valid_from`` must share a comparable type (seqs or timestamps).
    Partitioning assumption: one bucket's rows from both sides fit one
    task — raise ``num_buckets`` for bigger inputs."""
    import polars as pl

    f_schema = facts.schema().base_schema
    d_schema = dim.schema().base_schema
    f_names = [f.name for f in f_schema]
    d_names = [f.name for f in d_schema]
    for c in (*key_cols, valid_from, valid_to):
        if c not in d_names:
            raise ValueError(f"dim side is missing column {c!r}")
    overlap = (set(f_names) & set(d_names)) - set(key_cols)
    if overlap:
        raise ValueError(f"non-key column overlap in temporal join: {overlap}")
    dim_out = [n for n in d_names if n not in key_cols]  # incl. validity bounds
    union_fields = list(f_schema) + [f for f in d_schema if f.name not in f_names]
    out_schema = pa.schema(list(f_schema) + [d_schema.field(n) for n in dim_out])

    ft = facts.map_batches(
        _tag_stage(0, key_cols, union_fields, num_buckets), batch_format="pyarrow"
    )
    dt = dim.map_batches(
        _tag_stage(1, key_cols, union_fields, num_buckets), batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group["__side"], 0)
        fg = group.filter(mask).select(f_names)
        dg = group.filter(pc.invert(mask)).select(d_names)
        fdf = pl.from_arrow(fg).sort(ts_col)
        ddf = pl.from_arrow(dg).sort(valid_from)
        out = fdf.join_asof(
            ddf,
            left_on=ts_col,
            right_on=valid_from,
            by=list(key_cols),
            strategy="backward",
            check_sortedness=False,  # both sorted two lines up
        )
        # the asof step exposes the right-side ts under its own name
        if valid_from not in out.columns:
            out = out.rename({f"{valid_from}_right": valid_from})
        # interval post-filter: a match whose version was CLOSED before
        # the fact's ts (delete gap) is no match at all
        stale = pl.col(valid_to).is_not_null() & (pl.col(ts_col) >= pl.col(valid_to))
        out = out.with_columns(
            [pl.when(stale).then(None).otherwise(pl.col(c)).alias(c) for c in dim_out]
        )
        return out.to_arrow().select(out_schema.names).cast(out_schema)

    both = ft.union(dt)
    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def hash_shard_finalize(ds, key_cols: list[str], final_fn, num_shards: int = 32):
    """Shared finalize idiom for shuffle-heavy per-key reductions:
    append an int hash shard of ``key_cols``, groupby the SINGLE shard
    column (Ray's sort shuffle orders one int instead of the
    multi-column natural key — measured ~2x cheaper at sf0.1), then run
    one vectorized ``final_fn`` per shard with the shard column already
    dropped. Correct for any per-key reduction because every row of a
    key hashes to exactly one shard."""

    def shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__shard", hash_mod_column(batch, key_cols, num_shards)
        )

    def run(group: pa.Table) -> pa.Table:
        return final_fn(group.drop_columns(["__shard"]))

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(run, batch_format="pyarrow")
    )
