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
                  num_shards: int = 32, exact: bool = True,
                  distinct_limit: int = 20_000_000,
                  hll_p: int = 12) -> pa.Table:
    """Profile ``columns`` (default: all) of ``ds``; returns one small
    pa.Table row per column, sorted by column name.

    ``exact=False`` enables VOLUME ROUTING (the group_distinct_auto
    shape): when the table's row count — known for free from the counts
    pass — exceeds ``distinct_limit``, the per-column distinct-value
    exchange (itself corpus-scale on ultra-high-cardinality columns)
    is replaced by ONE fused HyperLogLog pass: a 2^hll_p-byte mergeable
    sketch per column per batch, folded by a tiny (column) groupby —
    shuffle bytes = #columns x #batches x 2^hll_p, never the values.
    Sketch-routed profiles report n_distinct to ~1.04/sqrt(2^hll_p)
    (~1.6% at p=12) and NULL top_value/top_count (a most-frequent value
    over a mostly-unique domain is not meaningful, and computing it
    exactly would need the very exchange the route avoids); n_rows and
    n_null stay exact. ``exact=True`` (default, the oracle path) always
    takes the exact exchange."""
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
    total_rows = max((nr for nr, _ in counts.values()), default=0)
    if not exact and total_rows > distinct_limit:
        return _profile_sketch(ds, columns, counts, hll_p)

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


def _profile_sketch(ds, columns: list[str], counts: dict, hll_p: int) -> pa.Table:
    """The volume-routed distinct path of :func:`profile_table`: ONE
    fused map_batches pass emits a serialized HyperLogLog per (column,
    batch); a (column)-keyed groupby merges them (register-wise max —
    associative, so any fold order is exact w.r.t. the sketch). The
    exchange carries #columns x #batches x ~2^hll_p bytes regardless of
    input size — the property the exact distinct-value exchange loses
    on ultra-high-cardinality columns."""
    import json

    from .sketch import HyperLogLog, xxhash64_column

    def hll_partials(batch: pa.Table) -> pa.Table:
        names, states = [], []
        for c in columns:
            sk = HyperLogLog(hll_p).add_hashed(xxhash64_column(batch[c]))
            names.append(c)
            states.append(json.dumps(sk.to_state()))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "__hll": pa.array(states, pa.string()),
            }
        )

    def merge_column(group: pa.Table) -> pa.Table:
        sk = HyperLogLog(hll_p)
        for st in group["__hll"].to_pylist():
            sk = sk.merge(HyperLogLog.from_state(json.loads(st)))
        return pa.table(
            {
                "column": group["column"].slice(0, 1).combine_chunks(),
                "n_distinct": pa.array([int(round(sk.estimate()))], pa.int64()),
            }
        )

    distinct = {
        r["column"]: int(r["n_distinct"])
        for r in (
            ds.map_batches(hll_partials, batch_format="pyarrow")
            .groupby("column")
            .map_groups(merge_column, batch_format="pyarrow")
            .take_all()
        )
    }
    cols_sorted = sorted(columns)
    return pa.table(
        {
            "column": cols_sorted,
            "n_rows": [counts.get(c, (0, 0))[0] for c in cols_sorted],
            "n_null": [counts.get(c, (0, 0))[1] for c in cols_sorted],
            "n_distinct": [distinct.get(c, 0) for c in cols_sorted],
            "top_value": pa.array([None] * len(cols_sorted), pa.string()),
            "top_count": pa.array([None] * len(cols_sorted), pa.int64()),
        },
        schema=_SCHEMA,
    )


def value_histogram(ds, value_col: str, bins: int, lo: float, hi: float) -> pa.Table:
    """Exact equi-width histogram of ``value_col`` over ``[lo, hi]`` —
    the distribution-QA companion to ``profile_table`` (quality-score /
    token-count / latency distributions before publishing a corpus).

    Bucket rule (shared char-for-char with the SQL twin so float64
    arithmetic is bit-identical on both sides):

        keep rows with lo <= v <= hi   (NULL and NaN excluded — NaN
                                        fails ``v <= hi`` in numpy AND
                                        in DuckDB, where NaN sorts
                                        greater than everything)
        bucket = min(floor((v - lo) * bins / (hi - lo)), bins - 1)

    i.e. ``bins`` half-open cells plus the closed top edge folded into
    the last cell. Distributed shape: one ``map_batches`` pass emits at
    most ``bins`` partial rows per batch (``np.bincount`` — the
    combiner), one tiny Sum groupby folds them, and the driver fills
    empty buckets with zeros. Output: (bucket int64, n int64), one row
    per bucket 0..bins-1 including empties — shuffle volume is bounded
    by bins x batches regardless of input size."""
    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    if bins < 1:
        raise ValueError("bins must be >= 1")
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError("need hi > lo")
    span = hi - lo

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        v = v[(v >= lo) & (v <= hi)]  # NaN/null fall out of both bounds
        b = np.minimum(
            np.floor((v - lo) * bins / span).astype(np.int64), bins - 1
        )
        cnt = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    got = {
        int(r["bucket"]): int(r["n"])
        for r in (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()
        )
    }
    return pa.table(
        {
            "bucket": pa.array(range(bins), pa.int64()),
            "n": pa.array([got.get(i, 0) for i in range(bins)], pa.int64()),
        }
    )


def embedding_dim_stats(ds, vec_col: str, dim: int) -> pa.Table:
    """Per-dimension embedding QA: (dim, n, vmin, vmax) for each of the
    ``dim`` coordinates — the dead-dimension / exploding-coordinate
    check a corpus run does before trusting an embedding column. Rows
    whose vector is NULL or whose length differs from ``dim`` are
    skipped (the SQL twin filters ``len(embedding) = dim``).

    Distributed shape: each batch flattens its fixed-length lists to an
    (n, dim) float64 matrix (zero-copy from Arrow ListArray values) and
    emits ``dim`` partial rows (count / per-dim min / per-dim max); one
    tiny groupby folds partials with Sum/Min/Max. min and max are exact
    — no float summation crosses engines, and the float32 -> float64
    widening is lossless, so the oracle hash-compares clean.

    NaN / list-interior-NULL caveat (documented, not load-bearing for
    the test tables, which contain neither): interior NULL elements
    surface as NaN in the flattened matrix; per-dim min uses np.nanmin
    (NaN never wins — DuckDB's NaN-sorts-greatest min agrees) while max
    uses np.max (NaN propagates — DuckDB max also returns NaN when one
    is present, but a NULL element diverges: SQL max skips it)."""
    import numpy as np

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    if dim < 1:
        raise ValueError("dim must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[vec_col].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), -1)
        keep = pc.equal(lens, dim)
        arr = col.filter(keep)
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "vmin": pa.array([], pa.float64()),
                    "vmax": pa.array([], pa.float64()),
                }
            )
        flat = (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, dim)
        )
        return pa.table(
            {
                "dim": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(dim, n, dtype=np.int64), pa.int64()),
                "vmin": pa.array(np.nanmin(flat, axis=0), pa.float64()),
                "vmax": pa.array(np.max(flat, axis=0), pa.float64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Min("vmin", alias_name="vmin"),
            _Max("vmax", alias_name="vmax"),
        )
        .take_all()
    )
    rows = sorted(out, key=lambda r: r["dim"])
    return pa.table(
        {
            "dim": pa.array([r["dim"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "vmin": pa.array([r["vmin"] for r in rows], pa.float64()),
            "vmax": pa.array([r["vmax"] for r in rows], pa.float64()),
        }
    )
