"""Windowed aggregates over an ordered event stream (SURVEY §2.9).

Ray Data has no event-time windows; per the streaming recipe the input
is treated as a partitioned ordered log: tumbling windows are a
vectorized bucket column + pre-aggregated groupby; session windows are
``groupby(key).map_groups`` over each key's time-sorted events. The
reference itself only micro-batches by wall clock (log rotation,
design-docs/pipeline.md:45-47) — these extend it to the windowing a
training-data/event pipeline needs.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum


def _floor_div(arr, divisor: int):
    """Null-safe int64 floor division (Arrow's divide truncates toward
    zero, which would assign pre-1970 events to windows that do not
    contain them: for negative secs, trunc(secs/step)*step > secs)."""
    q = pc.divide(arr, divisor)
    r = pc.subtract(arr, pc.multiply(q, divisor))
    # r < 0 already implies r != 0 for integer remainders
    adj = pc.cast(pc.less(r, 0), pa.int64())
    return pc.subtract(q, adj)


def _shard_stage(key_cols: list[str], num_shards: int,
                 require_valid: list[str] | None = None,
                 keep: list[str] | None = None):
    """The shared first half of every key-sharded operator here: a
    map_batches stage appending ``__shard`` = xxhash(keys) % num_shards
    (value-only hash — column names don't affect it). ``require_valid``
    drops rows where any listed column is null BEFORE hashing; ``keep``
    projects the batch after hashing."""
    from ..util import hash_mod_column

    def shard(batch: pa.Table) -> pa.Table:
        if require_valid:
            m = pc.is_valid(batch[require_valid[0]])
            for c in require_valid[1:]:
                m = pc.and_(m, pc.is_valid(batch[c]))
            batch = batch.filter(m)
        sh = hash_mod_column(batch, key_cols, num_shards)
        if keep:
            batch = batch.select(keep)
        return batch.append_column("__shard", sh)

    return shard


def _seconds_to_window_start(batch: pa.Table) -> pa.Table:
    """Post-aggregate fixup: epoch-seconds ``__ws`` -> ``window_start``
    timestamp[us] (aggregate-sized input; see tumbling_aggregate)."""
    ws = pc.cast(pc.multiply(batch["__ws"], 1_000_000), pa.timestamp("us"))
    return batch.append_column("window_start", ws).drop_columns(["__ws"])


def tumbling_aggregate(ds, ts_col: str, width_seconds: int, group_cols: list[str],
                       value_col: str):
    """count/sum/min/max of ``value_col`` per (group_cols, time bucket).

    Pre-aggregates inside map_batches (one row per group per batch)
    before the groupby, so the shuffle carries partials only. Bucket =
    epoch_seconds // width * width, exposed as a timestamp
    ``window_start`` (same definition the SQL oracle uses).
    """

    # the shuffle key is the INT64 epoch-seconds bucket, cast to a
    # timestamp only after the aggregate: int keys sort/exchange cheaper
    # than timestamps, and day-aligned datetime keys trip Ray's
    # numpy-datetime rebuild (datetime64[D] precision-warning path) when
    # the aggregated block is reassembled from Python key values
    def partial(batch: pa.Table) -> pa.Table:
        micros = pc.cast(batch[ts_col], pa.int64())
        bucket = pc.multiply(
            _floor_div(micros, width_seconds * 1_000_000), width_seconds
        )
        batch = batch.append_column("__ws", bucket)
        df = pl.from_arrow(batch.select(group_cols + ["__ws", value_col]))
        out = df.group_by(group_cols + ["__ws"]).agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.sum(value_col).alias("sum_value"),
            pl.min(value_col).alias("min_value"),
            pl.max(value_col).alias("max_value"),
        )
        return out.to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols + ["__ws"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
        .map_batches(_seconds_to_window_start, batch_format="pyarrow")
    )


def hopping_aggregate(ds, ts_col: str, width_seconds: int, step_seconds: int,
                      group_cols: list[str], value_col: str):
    """Hopping (sliding) windows: count/sum/min/max of ``value_col`` per
    (group_cols, window_start) where windows are ``width_seconds`` wide
    and advance by ``step_seconds`` (width must be a multiple of step).

    Each event belongs to exactly ``width//step`` windows — start =
    (secs // step - k) * step for k in 0..m-1, always within
    (secs - width, secs] — so the fan-out is a vectorized cross join
    with a tiny k-range frame, immediately collapsed by a per-batch
    partial aggregate: the shuffle carries at most (groups x windows)
    partial rows per batch, never the m-times-replicated events.
    Completes §2.9 alongside tumbling_aggregate / session_windows.
    """
    if width_seconds % step_seconds:
        raise ValueError("width_seconds must be a multiple of step_seconds")
    m = width_seconds // step_seconds

    # int64 epoch-seconds shuffle key, timestamp cast post-aggregate —
    # same rationale as tumbling_aggregate
    def partial(batch: pa.Table) -> pa.Table:
        micros = pc.cast(batch[ts_col], pa.int64())
        last = pc.multiply(
            _floor_div(micros, step_seconds * 1_000_000), step_seconds
        )
        tbl = batch.select(group_cols + [value_col]).append_column("__last", last)
        df = pl.from_arrow(tbl).join(
            pl.DataFrame({"__k": pl.Series(range(m), dtype=pl.Int64)}), how="cross"
        )
        df = df.with_columns(
            (pl.col("__last") - pl.col("__k") * step_seconds).alias("__ws")
        )
        out = df.group_by(group_cols + ["__ws"]).agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.sum(value_col).alias("sum_value"),
            pl.min(value_col).alias("min_value"),
            pl.max(value_col).alias("max_value"),
        )
        return out.to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols + ["__ws"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
        .map_batches(_seconds_to_window_start, batch_format="pyarrow")
    )


#: opt-in window functions for :func:`ordered_window_fns` — name -> the
#: polars expression factory applied after the per-shard key+order sort
_WINDOW_FNS = {
    "rn": lambda key, order, val: pl.int_range(
        1, pl.len() + 1, dtype=pl.Int64
    ).over(key).alias("rn"),
    "running_value": lambda key, order, val: pl.col(val)
    .cum_sum().over(key).alias("running_value"),
    "lag_value": lambda key, order, val: pl.col(val)
    .shift(1).over(key).alias("lag_value"),
    "lead_value": lambda key, order, val: pl.col(val)
    .shift(-1).over(key).alias("lead_value"),
    # rank over the ORDER columns (ties share a rank; rn breaks them)
    "rank": lambda key, order, val: pl.struct(order)
    .rank("min").over(key).cast(pl.Int64).alias("rank"),
    "dense_rank": lambda key, order, val: pl.struct(order)
    .rank("dense").over(key).cast(pl.Int64).alias("dense_rank"),
    # SQL FIRST_VALUE(val) OVER w; and LAST_VALUE(val) OVER (w ROWS
    # BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) — i.e. the
    # whole-partition last, NOT the default-frame current-row value
    "first_value": lambda key, order, val: pl.col(val)
    .first().over(key).alias("first_value"),
    "last_value": lambda key, order, val: pl.col(val)
    .last().over(key).alias("last_value"),
    # PERCENT_RANK / CUME_DIST: integer rank / integer count divided
    # once in float64 — the SAME two integers on both engines, so the
    # float results hash-compare exactly (no cross-engine summation).
    # percent_rank of a single-row partition is 0.0 by SQL definition.
    "percent_rank": lambda key, order, val: pl.when(pl.len().over(key) > 1)
    .then(
        (pl.struct(order).rank("min").over(key).cast(pl.Int64) - 1)
        / (pl.len().over(key).cast(pl.Int64) - 1)
    )
    .otherwise(0.0)
    .alias("percent_rank"),
    "cume_dist": lambda key, order, val: (
        pl.struct(order).rank("max").over(key).cast(pl.Int64)
        / pl.len().over(key).cast(pl.Int64)
    ).alias("cume_dist"),
}


def _rolling_expr(key_col: str, value_col: str, k: int):
    """SQL ``SUM(value) OVER (w ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW)`` — the bounded-frame rolling sum (min_samples=1 matches SQL's
    short head frames)."""
    return (
        pl.col(value_col)
        .rolling_sum(window_size=k, min_samples=1)
        .over(key_col)
        .alias(f"rolling{k}_value")
    )


def _ntile_expr(key_col: str, n: int):
    """SQL NTILE(n): split each partition's ordered rows into n buckets
    whose sizes differ by at most one, larger buckets first — the first
    ``c % n`` buckets get ``c//n + 1`` rows (c = partition count)."""
    i = pl.int_range(0, pl.len(), dtype=pl.Int64).over(key_col)
    c = pl.len().cast(pl.Int64).over(key_col)
    q, r = c // n, c % n
    big = r * (q + 1)  # rows living in the first r (larger) buckets
    # max_horizontal guards the unused otherwise-branch when q == 0
    # (polars evaluates both branches eagerly)
    bucket = (
        pl.when(i < big)
        .then(i // (q + 1))
        .otherwise(r + (i - big) // pl.max_horizontal(q, pl.lit(1, pl.Int64)))
    )
    return (bucket + 1).cast(pl.Int64).alias("ntile")


def ordered_window_fns(ds, key_col: str, order_cols: list[str],
                       value_col: str, num_shards: int = 32,
                       fns: tuple = ("rn", "running_value"),
                       ntile_n: int | None = None,
                       rolling_k: int | None = None):
    """Per-key ordered window functions OVER (PARTITION BY key ORDER BY
    order_cols): pick from ``rn`` (ROW_NUMBER), ``running_value``
    (running SUM, ROWS UNBOUNDED PRECEDING), ``lag_value`` / ``lead_value``
    (LAG/LEAD of ``value_col`` by 1), ``rank`` / ``dense_rank`` (over the
    order columns), ``first_value`` / ``last_value`` (whole-partition
    bounds of ``value_col``), ``ntile`` (requires ``ntile_n``; SQL
    NTILE bucket numbering), and ``rolling_value`` (requires
    ``rolling_k``; SUM over ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW,
    emitted as ``rolling<k>_value``). One output row per input row;
    default ``fns`` preserves the original (rn, running_value) schema.

    The reference has no analytics surface at all (SURVEY §2.5-2.6);
    this extends the engine with the warehouse window-function family a
    reference user's downstream SQL relies on. Shape mirrors
    ``session_windows``: keys are hash-sharded into ``num_shards``
    coarse groups (a key never spans shards — the ONE shuffle), then
    each shard computes ALL of its keys' windows in a single vectorized
    polars sort + ``.over(key)`` cumulative pass, not one Python call
    per key. Partitioning assumption: a shard's rows fit one task —
    callers with dominant hot keys should raise ``num_shards`` (a
    single key's rows still colocate; only cross-key balance changes).
    ``order_cols`` must be a per-key total order (include a unique
    tiebreaker column) or running values are nondeterministic.
    ``value_col`` should be non-null: a null row's running_value is
    null here (polars cum_sum) where SQL's frame-sum would carry the
    previous total — pre-coalesce if that distinction matters.
    """
    from ..util import hash_mod_column

    unknown = [
        f for f in fns
        if f not in ("ntile", "rolling_value") and f not in _WINDOW_FNS
    ]
    if unknown:
        raise ValueError(
            f"unknown window fns {unknown}; pick from "
            f"{sorted(_WINDOW_FNS) + ['ntile', 'rolling_value']}"
        )
    if "ntile" in fns and (ntile_n is None or ntile_n < 1):
        raise ValueError("fns including 'ntile' requires ntile_n >= 1")
    if "rolling_value" in fns and (rolling_k is None or rolling_k < 1):
        raise ValueError("fns including 'rolling_value' requires rolling_k >= 1")
    # dedupe: value_col may itself be an order column (e.g. rank over
    # the value) — a repeated name would make select() raise
    keep = list(dict.fromkeys([key_col, *order_cols, value_col]))

    shard = _shard_stage([key_col], num_shards, keep=keep)

    def windows_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.select(keep))
        df = df.sort([key_col, *order_cols])
        def expr(f):
            if f == "ntile":
                return _ntile_expr(key_col, ntile_n)
            if f == "rolling_value":
                return _rolling_expr(key_col, value_col, rolling_k)
            return _WINDOW_FNS[f](key_col, order_cols, value_col)

        return df.with_columns(*[expr(f) for f in fns]).to_arrow()

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(windows_shard, batch_format="pyarrow")
    )


def funnel_steps(ds, key_col: str, ts_col: str, event_col: str,
                 steps: list[str], num_shards: int = 32,
                 within: int | None = None):
    """Ordered-funnel conversion counts: how many keys (users) reached
    step k = saw ``steps[0]``, then ``steps[1]`` STRICTLY after their
    first step-1 time, then ``steps[2]`` strictly after that, ... Greedy
    earliest-match semantics (each step time is the min event time
    after the previous step's time), the standard product-analytics
    definition. ``within`` (optional conversion window) additionally
    requires step k to land no more than that many of ``ts_col``'s raw
    units after step k-1 (microseconds for timestamp columns). Returns
    ONE row: ``n_step1..n_stepK`` int64 counts, monotonically
    non-increasing.

    Shape: rows are pre-filtered to funnel events and pruned to three
    columns, hash-sharded by key (the one shuffle; a key never spans
    shards), and each shard resolves ALL its keys' step times in K-1
    vectorized polars join+min passes — per-step work, not per-key
    Python. The final fold carries one tiny count row per shard.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    from ..util import hash_mod_column

    keep = [key_col, ts_col, event_col]
    aliases = [f"t{k + 1}" for k in range(len(steps))]

    def shard(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep).filter(pc.is_in(batch[event_col], pa.array(steps)))
        sh = hash_mod_column(
            batch.select([key_col]).rename_columns(["__k"]), ["__k"], num_shards
        )
        return batch.append_column("__shard", sh)

    def steps_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.select(keep))
        cur = (
            df.filter(pl.col(event_col) == steps[0])
            .group_by(key_col)
            .agg(pl.min(ts_col).alias(aliases[0]))
        )
        for k, step in enumerate(steps[1:], start=1):
            after = pl.col(ts_col) > pl.col(aliases[k - 1])
            if within is not None:
                # Int64 cast = raw units for both integer and Datetime
                # (us) time columns, so one predicate serves both
                after &= (
                    pl.col(ts_col).cast(pl.Int64)
                    - pl.col(aliases[k - 1]).cast(pl.Int64)
                ) <= within
            nxt = (
                df.filter(pl.col(event_col) == step)
                .join(cur.select([key_col, aliases[k - 1]]), on=key_col)
                .filter(after)
                .group_by(key_col)
                .agg(pl.min(ts_col).alias(aliases[k]))
            )
            cur = cur.join(nxt, on=key_col, how="left")
        counts = cur.select(
            [pl.col(a).count().cast(pl.Int64).alias(f"n_step{k + 1}")
             for k, a in enumerate(aliases)]
        )
        return counts.to_arrow()

    def fold(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            [pl.sum(f"n_step{k + 1}").alias(f"n_step{k + 1}")
             for k in range(len(steps))]
        ).to_arrow()

    # Zero-row seed: when NO event matches any step the shard filter
    # empties the dataset and map_groups emits nothing — the documented
    # contract is still ONE all-zero row (what the SQL oracle returns),
    # so union a zeros row that the final fold sums in harmlessly.
    import ray.data as _rd

    zeros = pa.table(
        {f"n_step{k + 1}": pa.array([0], pa.int64()) for k in range(len(steps))}
    )
    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(steps_shard, batch_format="pyarrow")
        .union(_rd.from_arrow(zeros))
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow")
    )


def session_windows(ds, key_col: str, ts_col: str, gap_seconds: int,
                    num_shards: int = 32):
    """Session windowing: per key, events sorted by time; a gap larger
    than ``gap_seconds`` starts a new session. Returns one row per
    session (key, session_start, session_end, n_events).

    Keys are hash-sharded into ``num_shards`` coarse groups (a key never
    spans shards) and each shard's sessions are computed in ONE
    vectorized pandas pass over all of its keys — not one map_groups
    call per key, which pays a Python invocation per group.
    Partitioning assumption: a shard's events fit one task.
    """
    shard = _shard_stage([key_col], num_shards)

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        new_sess = (g[key_col] != g[key_col].shift()) | (
            g[ts_col].diff().dt.total_seconds() > gap_seconds
        )
        sid = new_sess.cumsum()
        out = g.groupby(sid).agg(
            **{
                key_col: (key_col, "first"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n_events": (ts_col, "size"),
            }
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index(drop=True)[
            [key_col, "session_start", "session_end", "n_events"]
        ]

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(sessions_shard, batch_format="pandas")
    )


def scd2_history(
    ds,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_value: str = "delete",
    attr_cols: list[str] | None = None,
    num_shards: int = 32,
):
    """Slowly-changing-dimension Type-2 history from a CDC changelog —
    the warehouse-side complement to the lake's LWW-latest state
    (sinks/lake.py keeps only each key's final version; SCD2 keeps them
    ALL with validity intervals, the shape BI dimension tables expect).

    Per key ordered by ``seq_col``, each event opens a version at its
    own seq and the NEXT event of any kind closes it:

      valid_from_seq   the event's seq
      valid_to_seq     lead(seq) over the key (null = still open)
      is_current       valid_to_seq IS NULL and the row is not a delete

    Delete events participate in interval bounds (they close the prior
    version) but emit no row themselves; a later re-insert simply opens
    a new interval — exactly SQL's ``lead() OVER (PARTITION BY key
    ORDER BY seq)`` with a ``op <> delete`` post-filter, which is the
    driver oracle for `scd2_history`.

    Distributed shape mirrors ordered_window_fns: ONE hash shuffle on
    the composite key (a key never spans shards), then each shard
    resolves all its keys in a single vectorized polars sort +
    ``shift(-1).over(keys)`` pass. (key, seq) pairs must be unique per
    key — CDC commit seqs are — or interval bounds are nondeterministic.
    ``attr_cols`` picks the carried attribute columns (default: every
    non-system input column)."""
    from ..util import hash_mod_column

    if attr_cols is None:
        skip = set(key_cols) | {seq_col, op_col}
        attr_cols = [c for c in ds.schema().names if c not in skip]
    keep = [*key_cols, seq_col, *([op_col] if op_col else []), *attr_cols]

    shard = _shard_stage(key_cols, num_shards, keep=keep)

    def versions_shard(g: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(g.select(keep))
            .sort([*key_cols, seq_col])
            .with_columns(
                pl.col(seq_col).shift(-1).over(key_cols).alias("valid_to_seq")
            )
        )
        if op_col:
            df = df.filter(pl.col(op_col) != delete_value).drop(op_col)
        df = df.with_columns(pl.col("valid_to_seq").is_null().alias("is_current"))
        out = df.rename({seq_col: "valid_from_seq"}).select(
            [*key_cols, *attr_cols, "valid_from_seq", "valid_to_seq", "is_current"]
        )
        return out.to_arrow()

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(versions_shard, batch_format="pyarrow")
    )


def retention_cohorts(ds, key_col: str, ts_col: str,
                      period_seconds: int = 7 * 86400, num_shards: int = 32):
    """Cohort retention matrix: cohort = each key's FIRST activity
    period (epoch // period_seconds), offset = periods since cohort,
    n_active = distinct keys from that cohort active at that offset.
    Rows with a null key or null timestamp are dropped (a cohort needs
    both). One row per (cohort_period, period_offset).

    ONE key-hash shuffle total: a key lives in exactly one shard, so a
    shard's per-(cohort, offset) distinct-key counts are DISJOINT
    partials, and the global fold is a tiny Sum groupby over at most
    shards x cohorts x offsets rows — the distinct never reshuffles.
    Partitioning assumption: one shard's events fit one task (raise
    num_shards for skewed key spaces)."""
    period_us = period_seconds * 1_000_000
    out_schema = pa.schema(
        [
            ("cohort_period", pa.int64()),
            ("period_offset", pa.int64()),
            ("n_active", pa.int64()),
        ]
    )

    shard = _shard_stage([key_col], num_shards, require_valid=[key_col, ts_col])

    def cohorts_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.select([key_col, ts_col]))
        out = (
            df.with_columns(
                (pl.col(ts_col).cast(pl.Int64) // period_us).alias("__per")
            )
            .with_columns(pl.col("__per").min().over(key_col).alias("cohort_period"))
            .select(
                key_col,
                "cohort_period",
                (pl.col("__per") - pl.col("cohort_period")).alias("period_offset"),
            )
            .unique()
            .group_by(["cohort_period", "period_offset"])
            .agg(pl.len().cast(pl.Int64).alias("n_active"))
        )
        return out.to_arrow().cast(out_schema)

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(cohorts_shard, batch_format="pyarrow")
        .groupby(["cohort_period", "period_offset"])
        .aggregate(Sum("n_active", alias_name="n_active"))
    )


def top_event_paths(ds, key_col: str, ts_col: str, event_col: str,
                    path_len: int = 5, k: int = 20, sep: str = " > ",
                    tiebreak_col: str | None = None, num_shards: int = 32):
    """Most common event journeys: per key, the first ``path_len``
    events ordered by (ts, tiebreak) joined into a path string; returns
    the top ``k`` paths by distinct-key count as an Arrow table
    ``(path, n_users)`` ordered (n DESC, path ASC). Null keys/ts drop.

    Same one-shuffle shape as retention_cohorts: a key's whole history
    lands in one shard, so its path is computed exactly once and
    per-path counts are addable partials; the global fold is a small
    path groupby + per-block partial top-k with a driver fold of the
    tiny partials (vocab_top20 pattern)."""
    shard = _shard_stage([key_col], num_shards, require_valid=[key_col, ts_col])

    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def paths_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        out = (
            # nulls_last matches SQL ORDER BY on a nullable tiebreak col
            # (polars defaults nulls FIRST even ascending — CLAUDE.md)
            df.sort([key_col] + order, nulls_last=True)
            .with_columns(pl.col(ts_col).cum_count().over(key_col).alias("__rn"))
            .filter(pl.col("__rn") <= path_len)
            .group_by(key_col, maintain_order=True)
            .agg(
                pl.col(event_col).str.join(sep).alias("path"),
                pl.col(event_col).count().alias("__nn"),
            )
            # str.join over an all-null window gives "" but SQL
            # string_agg gives NULL — pin the NULL semantics
            .with_columns(
                pl.when(pl.col("__nn") > 0).then(pl.col("path")).alias("path")
            )
            .group_by("path")
            .agg(pl.len().cast(pl.Int64).alias("n_users"))
        )
        return out.select(["path", "n_users"]).to_arrow().cast(
            pa.schema([("path", pa.string()), ("n_users", pa.int64())])
        )

    counts = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(paths_shard, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .sort(["n_users", "path"], descending=[True, False], nulls_last=True)
            .head(k)
            .to_arrow()
        )

    partials = counts.map_batches(block_topk, batch_format="pyarrow").take_all()
    final = (
        pl.from_arrow(
            pa.Table.from_pylist(
                partials,
                schema=pa.schema([("path", pa.string()), ("n_users", pa.int64())]),
            )
        )
        .sort(["n_users", "path"], descending=[True, False], nulls_last=True)
        .head(k)
    )
    return final.to_arrow().cast(
        pa.schema([("path", pa.string()), ("n_users", pa.int64())])
    )
