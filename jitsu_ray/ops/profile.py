"""Distributed table profiling — the per-column summary report every
data platform runs before publishing a table (the Deequ / ydata-profile
shape, exact rather than sampled).

Output: one row per profiled column —

  column      name
  n_rows      total rows (nulls included)
  n_null      null count
  n_distinct  exact COUNT(DISTINCT col) (nulls excluded)
  top_value   most frequent non-null value, CAST to string; ties break
              to the SMALLEST value (deterministic); null for float
              columns (float->string formatting is not portable across
              engines, and a "most frequent double" is rarely meaningful)
  top_count   its occurrence count (null for float columns)

Distributed shapes:
- counts/nulls: ONE fused map_batches pass over all profiled columns,
  folded by a tiny (column) groupby — shuffle rows = #columns x #batches.
- distinct + top value: per column, a per-batch (value, n) partial count
  (the combiner — the exchange carries distinct values, never rows),
  ONE int-hash-shard exchange, then per-shard fold; the shard count sum
  is n_distinct and each shard's argmax row is a candidate for the
  global top (the global winner is the winner of its own shard), so the
  driver folds #shards candidate rows, not the value domain. The same
  discipline as vocab_top20; for domains where even distinct values are
  corpus-scale, ops/sketch (HLL + Misra-Gries) is the approximate path.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("top_value", pa.string()),
        ("top_count", pa.int64()),
    ]
)


def profile_table(ds, columns: list[str] | None = None,
                  num_shards: int = 32) -> pa.Table:
    """Profile ``columns`` (default: all) of ``ds``; returns one small
    pa.Table row per column, sorted by column name."""
    from .join import hash_shard_finalize

    schema = ds.schema().base_schema
    if columns is None:
        columns = list(schema.names)
    float_cols = {
        c for c in columns if pa.types.is_floating(schema.field(c).type)
    }

    def count_partials(batch: pa.Table) -> pa.Table:
        names, rows, nulls = [], [], []
        for c in columns:
            names.append(c)
            rows.append(batch.num_rows)
            nulls.append(batch[c].null_count)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(rows, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
            }
        )

    counts = {
        r["column"]: (int(r["sum(n_rows)"]), int(r["sum(n_null)"]))
        for r in (
            ds.map_batches(count_partials, batch_format="pyarrow")
            .groupby("column")
            .aggregate(Sum("n_rows"), Sum("n_null"))
            .take_all()
        )
    }

    def _fmt_top(v, typ) -> str:
        """CAST(x AS VARCHAR) parity with DuckDB: Python str(datetime)
        renders trailing-zero microseconds ('...56.500000') where DuckDB
        trims to the shortest fraction ('...56.5', or none when zero) —
        trim the fractional part the same way for temporal values.
        (Naive timestamps only, which is all parquet round-trips here.)"""
        s = str(v)
        if (pa.types.is_timestamp(typ) or pa.types.is_time(typ)) and "." in s:
            head, _, frac = s.partition(".")
            frac = frac.rstrip("0")
            s = head + ("." + frac if frac else "")
        return s

    def profile_one(c: str):
        def value_counts(t: pa.Table, _c=c) -> pa.Table:
            d = (
                pl.from_arrow(t.select([_c]))
                .drop_nulls()
                .group_by(_c)
                .len(name="__n")
                .with_columns(pl.col("__n").cast(pl.Int64))
            )
            return d.to_arrow().cast(
                pa.schema([(_c, t.schema.field(_c).type), ("__n", pa.int64())])
            )

        def shard_fold(t: pa.Table, _c=c) -> pa.Table:
            d = (
                pl.from_arrow(t)
                .group_by(_c)
                .agg(pl.col("__n").sum())
                .with_columns(pl.col("__n").cast(pl.Int64))
            )
            return d.to_arrow().cast(t.schema)

        folded = hash_shard_finalize(
            ds.map_batches(value_counts, batch_format="pyarrow"),
            [c],
            shard_fold,
            num_shards=num_shards,
        ).materialize()
        n_distinct = folded.count()
        top_value, top_count = None, None
        if c not in float_cols and n_distinct:
            # each shard's argmax is the only candidate its values can
            # contribute; fold the <= num_shards candidates driver-side
            def shard_top(t: pa.Table, _c=c) -> pa.Table:
                d = pl.from_arrow(t).sort(
                    ["__n", _c], descending=[True, False], nulls_last=True
                )
                return d.head(1).to_arrow().cast(t.schema)

            cands = pa.concat_tables(
                b for b in folded.map_batches(
                    shard_top, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            )
            best = pl.from_arrow(cands).sort(
                [pl.col("__n"), pl.col(c)], descending=[True, False]
            ).head(1)
            top_value = _fmt_top(best[c][0], schema.field(c).type)
            top_count = int(best["__n"][0])
        n_rows, n_null = counts.get(c, (0, 0))  # zero-block input
        return (c, n_rows, n_null, n_distinct, top_value, top_count)

    # per-column pipelines are independent full scans — run them on a
    # small driver thread pool so wall-clock approaches the max of the
    # scans, not their sum (each thread blocks on its own materialize;
    # Ray Data executions from separate driver threads run concurrently)
    from concurrent.futures import ThreadPoolExecutor

    cols_sorted = sorted(columns)
    with ThreadPoolExecutor(max_workers=min(4, max(1, len(cols_sorted)))) as ex:
        out = list(ex.map(profile_one, cols_sorted))

    return pa.table(
        {
            "column": [r[0] for r in out],
            "n_rows": [r[1] for r in out],
            "n_null": [r[2] for r in out],
            "n_distinct": [r[3] for r in out],
            "top_value": [r[4] for r in out],
            "top_count": [r[5] for r in out],
        },
        schema=_SCHEMA,
    )
