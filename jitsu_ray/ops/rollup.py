"""Multi-level (ROLLUP) aggregation.

``GROUP BY ROLLUP(d1, d2, ...)`` semantics over a Dataset: one result
row set per prefix level of the dimension list, from the finest
(d1..dn) down to the grand total, with rolled-up dimension columns
NULL-filled (SQL ROLLUP's convention — callers whose dims can be null
themselves should pre-coalesce to a sentinel, as in SQL).

Scale shape — partial-aggregate REUSE, the property that makes rollups
cheap at 100 TB: only the finest level touches the input (per-batch
partial aggregation before its groupby, so the one data-sized shuffle
carries partials), and every coarser level re-aggregates the finest
level's already-tiny result. n levels cost one input pass + (n-1)
re-aggregations of aggregate-sized data, not n input passes.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from .join import hash_shard_finalize


def grouping_sets_aggregate(ds, sets: list[list[str]], value_cols: list[str],
                            grouping_id: list[str] | None = None):
    """``GROUP BY GROUPING SETS ((...), (...), ...)`` semantics: count
    (``n``) + per-column sums (``sum_<col>``) for each grouping set,
    unioned with non-member dims NULL-filled (so ``CUBE`` = the power
    set, ``ROLLUP`` = the prefix chain).

    ``grouping_id``: optional dim order for an extra int64
    ``grouping_id`` column = SQL ``GROUPING(dims...)`` — bit per dim
    (first listed dim most significant), set when that dim is ROLLED UP
    in the row's set. This is how SQL callers distinguish a rolled-up
    NULL from a genuine null group value; constant per level, so it
    costs one literal column per set.

    Same partial-reuse shape as ``rollup_aggregate``: ONE input pass
    builds the finest level (the union of all sets' dims, per-batch
    partials before its groupby), and every requested set re-aggregates
    that already-aggregate-sized result. Duplicate sets are rejected
    (SQL would emit duplicate rows; a caller that wants that can union
    twice explicitly).
    """
    if not sets:
        raise ValueError("grouping sets need at least one set")
    keys = [tuple(sorted(s)) for s in sets]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate grouping sets: {sets}")
    all_dims = sorted({d for s in sets for d in s})
    if grouping_id is not None and sorted(grouping_id) != all_dims:
        raise ValueError(
            f"grouping_id order {grouping_id} must cover exactly the "
            f"union of the sets' dims {all_dims}"
        )
    schema = ds.schema().base_schema
    dim_fields = [schema.field(d) for d in all_dims]
    sums = [f"sum_{c}" for c in value_cols]

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(all_dims + value_cols))
        out = df.group_by(all_dims).agg(
            pl.len().cast(pl.Int64).alias("n"),
            *[pl.sum(c).alias(s) for c, s in zip(value_cols, sums)],
        )
        return out.to_arrow()

    def refold(dims: list[str]):
        """Merge partials per key — polars group_by, which (unlike Ray's
        sort shuffle) forms a group for NULL key values instead of
        crashing on the None-vs-str comparison."""

        def run(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            return (
                df.group_by(dims)
                .agg(pl.sum("n").alias("n"), *[pl.sum(s).alias(s) for s in sums])
                .to_arrow()
            )

        return run

    # hash-shard finalize instead of groupby(all_dims).aggregate: one
    # int shard column through the sort shuffle (the repo-wide idiom,
    # ~2x cheaper than a multi-column key sort) AND null-safe — a NULL
    # dim value is a legal group that Ray's sort shuffle cannot order
    finest = hash_shard_finalize(
        ds.map_batches(partial, batch_format="pyarrow"), all_dims, refold(all_dims)
    ).materialize()  # every set re-reads it; it is aggregate-sized

    def pad(level_dims: list[str]):
        gid = (
            None
            if grouping_id is None
            else sum(
                1 << (len(grouping_id) - 1 - i)
                for i, d in enumerate(grouping_id)
                if d not in level_dims
            )
        )

        def run(batch: pa.Table) -> pa.Table:
            cols = {}
            for f in dim_fields:
                if f.name in level_dims:
                    cols[f.name] = batch[f.name]
                else:
                    cols[f.name] = pa.nulls(batch.num_rows, f.type)
            if gid is not None:
                cols["grouping_id"] = pa.array(
                    [gid] * batch.num_rows, pa.int64()
                )
            cols["n"] = batch["n"]
            for s in sums:
                cols[s] = batch[s]
            return pa.table(cols)

        return run

    def total_fold(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["n"] + sums))
        return df.select(
            pl.sum("n").alias("n"), *[pl.sum(s).alias(s) for s in sums]
        ).to_arrow()

    levels = []
    for s in sets:
        s = list(s)
        if sorted(s) == all_dims:
            lv = finest.map_batches(pad(s), batch_format="pyarrow")
        elif s:
            lv = hash_shard_finalize(finest, s, refold(s)).map_batches(
                pad(s), batch_format="pyarrow"
            )
        else:  # grand total: fold finest partials down to one row
            lv = (
                finest.repartition(1)
                .map_batches(total_fold, batch_format="pyarrow")
                .map_batches(pad([]), batch_format="pyarrow")
            )
        levels.append(lv)
    return levels[0].union(*levels[1:]) if len(levels) > 1 else levels[0]


def cube_aggregate(ds, dims: list[str], value_cols: list[str]):
    """``GROUP BY CUBE(dims)`` = grouping sets over the full power set
    (2^len(dims) sets — keep dims short; each non-finest set costs one
    re-aggregation of the finest level, never an input pass)."""
    if not dims:
        raise ValueError("cube needs at least one dimension")
    if len(dims) > 6:
        raise ValueError("cube over >6 dims is 2^n grouping sets; "
                         "enumerate the sets you need explicitly")
    sets = [
        [d for k, d in enumerate(dims) if mask >> k & 1]
        for mask in range(2 ** len(dims) - 1, -1, -1)
    ]
    return grouping_sets_aggregate(ds, sets, value_cols)


def rollup_aggregate(ds, dims: list[str], value_cols: list[str]):
    """count (``n``) + per-column sums (``sum_<col>``) at every ROLLUP
    prefix level of ``dims``. Returns one Dataset: the union of all
    levels, each padded to the full schema with typed nulls for its
    rolled-up dims.

    ROLLUP(dims) IS GROUPING SETS over the prefix chain, so this
    delegates to :func:`grouping_sets_aggregate` (one partial-reuse
    machinery to maintain) and only restores the caller-facing column
    order (``dims`` order, not the union's sorted order).
    """
    if not dims:
        raise ValueError("rollup needs at least one dimension")
    sets = [list(dims[:j]) for j in range(len(dims), -1, -1)]
    out = grouping_sets_aggregate(ds, sets, value_cols)
    return out.select_columns(
        list(dims) + ["n"] + [f"sum_{c}" for c in value_cols]
    )
