"""Distributed SQL set operations: INTERSECT / EXCEPT in both DISTINCT
and ALL (bag / multiplicity) semantics over arbitrary key-column
tuples.

Not in the reference's inventory (its only set op is the multi-table
union fan-out, SURVEY §2.7 D4) — this is an LLM-data-suite addition:
the snapshot-diff primitive a corpus pipeline needs ("which documents
were added/removed between crawls", "which user-days saw a view but no
purchase").

Shape, built for 100 TB:
- per-batch LOCAL DISTINCT (polars ``unique``) on each side before the
  exchange, so at most one row per key per input batch is shuffled;
- both sides tagged with an int8 ``__side`` marker and unioned — ONE
  shuffle total, via :func:`jitsu_ray.ops.join.hash_shard_finalize`
  (single int shard key instead of the multi-column natural key);
- one vectorized polars fold per shard computes each key's min/max side
  and filters by the op's predicate (INTERSECT: seen on both sides;
  EXCEPT: never seen on side b). No driver-side materialization.

NULL semantics match SQL set ops: two NULL keys compare EQUAL (DISTINCT
grouping), unlike join predicates — polars ``group_by`` groups nulls
together, which is exactly the behavior DuckDB's INTERSECT/EXCEPT have.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from .join import hash_shard_finalize

__all__ = [
    "intersect_distinct",
    "except_distinct",
    "intersect_all",
    "except_all",
]


def _tagged_distinct(ds, cols: list[str], side: int):
    def run(batch: pa.Table) -> pa.Table:
        t = pl.from_arrow(batch.select(cols)).unique().to_arrow()
        return t.append_column(
            "__side", pa.array([side] * t.num_rows, pa.int8())
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _setop(a, b, cols: list[str], keep_expr, num_shards: int):
    u = _tagged_distinct(a, cols, 0).union(_tagged_distinct(b, cols, 1))

    def final_shard(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = (
            df.group_by(cols)
            .agg(
                pl.min("__side").alias("__lo"),
                pl.max("__side").alias("__hi"),
            )
            .filter(keep_expr)
            .drop(["__lo", "__hi"])
        )
        return out.to_arrow()

    return hash_shard_finalize(u, cols, final_shard, num_shards=num_shards)


def intersect_distinct(a, b, cols: list[str], num_shards: int = 32):
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT DISTINCT cols
    FROM b`` — key tuples present in BOTH datasets, one row each."""
    return _setop(
        a, b, cols, (pl.col("__lo") == 0) & (pl.col("__hi") == 1), num_shards
    )


def except_distinct(a, b, cols: list[str], num_shards: int = 32):
    """``SELECT DISTINCT cols FROM a EXCEPT SELECT DISTINCT cols FROM
    b`` — key tuples present in ``a`` and absent from ``b``."""
    # a-only keys have max side 0 (min <= max, so no __lo check needed)
    return _setop(a, b, cols, pl.col("__hi") == 0, num_shards)


def _tagged_counts(ds, cols: list[str], side: str):
    def run(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols))
        out = df.group_by(cols).agg(pl.len().cast(pl.Int64).alias(side))
        t = out.to_arrow()
        other = "__cb" if side == "__ca" else "__ca"
        return t.append_column(other, pa.nulls(t.num_rows, pa.int64()))

    return ds.map_batches(run, batch_format="pyarrow")


def _setop_all(a, b, cols: list[str], n_expr, num_shards: int):
    """Bag-semantics core: per-key multiplicities per side (per-batch
    count partials — at most one row per key per batch crosses the one
    exchange), then a per-shard fold computes each key's output copy
    count from ``n_expr`` and repeats the key that many times (SQL ALL
    variants return duplicate rows)."""
    u = _tagged_counts(a, cols, "__ca").union(_tagged_counts(b, cols, "__cb"))

    def final_shard(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = (
            df.group_by(cols)
            .agg(
                pl.sum("__ca").fill_null(0).alias("__ca"),
                pl.sum("__cb").fill_null(0).alias("__cb"),
            )
            .with_columns(n_expr.alias("__n"))
            .filter(pl.col("__n") > 0)
        )
        # repeat each key row __n times (duckdb EXCEPT ALL parity)
        out = (
            out.with_columns(pl.int_ranges(pl.col("__n")).alias("__r"))
            .explode("__r")
            .drop(["__ca", "__cb", "__n", "__r"])
        )
        return out.to_arrow()

    return hash_shard_finalize(u, cols, final_shard, num_shards=num_shards)


def intersect_all(a, b, cols: list[str], num_shards: int = 32):
    """``SELECT cols FROM a INTERSECT ALL SELECT cols FROM b`` — each
    key tuple repeated min(count_a, count_b) times."""
    return _setop_all(
        a, b, cols, pl.min_horizontal("__ca", "__cb"), num_shards
    )


def except_all(a, b, cols: list[str], num_shards: int = 32):
    """``SELECT cols FROM a EXCEPT ALL SELECT cols FROM b`` — each key
    tuple repeated max(count_a - count_b, 0) times."""
    return _setop_all(
        a,
        b,
        cols,
        pl.max_horizontal(pl.col("__ca") - pl.col("__cb"), pl.lit(0, pl.Int64)),
        num_shards,
    )
