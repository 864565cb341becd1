"""Categorical pivot (wide) aggregation.

``PIVOT``/crosstab semantics over a Dataset: one output row per group,
one ``n_<cat>`` count column and one ``v_<cat>`` value-sum column per
category of a low-cardinality pivot column. The reference has no
analytics surface (SURVEY §2.5); this is the warehouse crosstab a
reference user's downstream SQL produces with
``count(*)/sum(v) FILTER (WHERE cat = ...)`` per category.

Scale shape: the category domain must be small (it becomes the output
schema — hundreds, not millions); groups can be huge. Each batch is
collapsed to one wide partial row per group before the groupby, so the
single shuffle carries (groups x batches) wide partials, never input
rows. Category discovery (``categories=None``) costs one extra pass
over just the pivot column (``Dataset.unique`` — pruned, pre-aggregated
per block); callers that know the domain should pass it explicitly and
skip that pass.
"""

from __future__ import annotations

import re

import polars as pl
import pyarrow as pa
from ray.data.aggregate import Sum


def _slug(cat: str) -> str:
    """Category value -> column-name fragment (lowercase, [a-z0-9_])."""
    return re.sub(r"[^a-z0-9_]+", "_", str(cat).lower()).strip("_") or "null"


def pivot_aggregate(ds, group_cols: list[str], cat_col: str, value_col: str,
                    categories: list[str] | None = None):
    """count (``n_<cat>``) + sum of ``value_col`` (``v_<cat>``) per
    group row, one column pair per category. Rows of a category not
    listed in ``categories`` are ignored (SQL ``IN`` filter parity);
    a (group, category) with no rows yields 0 in both columns."""
    if categories is None:
        # drop a null category: a NULL never equals anything, so its
        # column pair could only ever be zeros (SQL FILTER (cat = ...)
        # parity — NULL rows fall out of every bucket either way)
        categories = [
            c for c in ds.select_columns([cat_col]).unique(cat_col)
            if c is not None
        ]
    elif any(c is None for c in categories):
        raise ValueError("None is not a pivotable category (never equal)")
    categories = sorted(categories)
    if len(categories) > 10_000:
        raise ValueError(
            f"{len(categories)} categories would become output COLUMNS; "
            "pivot is for low-cardinality domains — aggregate long-form "
            "(groupby cat) instead"
        )
    slugs = [_slug(c) for c in categories]
    if len(set(slugs)) != len(slugs):
        raise ValueError(f"category names collide after slugging: {slugs}")
    out_cols = [x for s in slugs for x in (f"n_{s}", f"v_{s}")]

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(group_cols + [cat_col, value_col]))
        aggs = []
        for c, s in zip(categories, slugs):
            hit = pl.col(cat_col) == c
            aggs.append(hit.sum().cast(pl.Int64).alias(f"n_{s}"))
            aggs.append(
                pl.col(value_col).filter(hit).sum().fill_null(0).alias(f"v_{s}")
            )
        return df.group_by(group_cols).agg(aggs).to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols)
        .aggregate(*[Sum(c, alias_name=c) for c in out_cols])
    )


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value"):
    """Melt wide -> long: one output row per (input row, measure column)
    whose measure is non-null (DuckDB ``UNPIVOT``'s default NULL
    exclusion). Inverse of :func:`pivot_aggregate`'s shape.

    Pure per-batch flat transform — no shuffle, embarrassingly parallel
    at any scale (output is ``len(value_cols)``x the input rows; the
    streaming executor splits oversized output blocks downstream).
    ``value_cols`` must share one Arrow type (the long format has a
    single value column; cast upstream if they differ).
    """
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")
    taken = set(id_cols) | {var_name}
    if var_name in id_cols or value_name in taken:
        raise ValueError(
            f"var_name/value_name ({var_name!r}, {value_name!r}) must not "
            f"collide with each other or with id columns {id_cols}"
        )
    schema = ds.schema().base_schema
    types = {str(schema.field(c).type) for c in value_cols}
    if len(types) > 1:
        raise ValueError(f"value columns must share one type, got {types}")

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            keep = pa.compute.is_valid(batch[c])
            sub = batch.filter(keep)
            parts.append(
                pa.table(
                    {
                        **{i: sub[i] for i in id_cols},
                        var_name: pa.array([c] * sub.num_rows, pa.string()),
                        value_name: sub[c],
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")
