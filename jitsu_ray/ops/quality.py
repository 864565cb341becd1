"""Data-contract validation — the dbt-test family (unique / not_null /
accepted_values / relationships) as distributed Ray Data jobs.

A CDC pipeline's downstream consumers encode expectations ("event_id is
unique", "event_type comes from this enum", "user_id exists in the
customer dimension"); this module turns a declarative contract into one
small violations report the ingest driver can gate a publish on. The
reference has no test harness surface (its validation is per-event type
coercion, SURVEY §1.2); this is the warehouse-side completeness feature
its users run as dbt tests today.

Distributed shapes, per constraint family:

- ``not_null`` / ``accepted_values``: ONE fused map_batches pass emits
  per-batch partial violation counts for every such constraint; a tiny
  (constraint, column) groupby folds them. Shuffle volume = #constraints
  x #batches rows.
- ``unique``: violations = count(non-null rows) - count(distinct
  non-null values) (SQL ``count(col) - count(DISTINCT col)``). Distinct
  is per-batch unique -> one int-hash-shard exchange -> per-shard
  unique, so the exchange carries unique values, never rows.
- ``fk`` (dbt "relationships"): violations = non-null child values
  absent from the parent key set, via the Bloom-prefiltered exact anti
  filter (ops/sketch.semi_anti_filter_scaled — ~10 bits/key broadcast,
  exact side fetched lazily) for integer keys, plain broadcast ``is_in``
  otherwise. Null children don't violate (dbt semantics).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

_SCHEMA = pa.schema(
    [("constraint", pa.string()), ("column", pa.string()), ("violations", pa.int64())]
)


def validate_constraints(
    ds,
    unique: tuple[str, ...] = (),
    not_null: tuple[str, ...] = (),
    accepted_values: dict[str, list] | None = None,
    fk: dict[str, pa.Array] | None = None,
) -> pa.Table:
    """Run a declarative data contract over ``ds``; returns one small
    pa.Table(constraint, column, violations) row per declared check,
    sorted by (constraint, column). violations == 0 everywhere means
    the contract holds."""
    accepted_values = accepted_values or {}
    fk = fk or {}
    rows: list[tuple[str, str, int]] = []

    # the unique constraints' non-null counts ride the SAME fused pass as
    # not_null / accepted_values (an extra "__nonnull" spec each) instead
    # of a dedicated count-only scan per column — one scan serves all
    # batch-countable constraints
    batch_specs = (
        [("not_null", c) for c in not_null]
        + [("accepted_values", c) for c in accepted_values]
        + [("__nonnull", c) for c in unique]
    )
    nonnull_counts: dict[str, int] = {}
    if batch_specs:
        av = {c: pa.array(sorted(vs)) for c, vs in accepted_values.items()}

        def partials(batch: pa.Table) -> pa.Table:
            kinds, cols, viols = [], [], []
            for kind, c in batch_specs:
                col = batch[c]
                if kind == "not_null":
                    v = col.null_count
                elif kind == "__nonnull":
                    v = len(col) - col.null_count
                else:
                    nn = col.drop_null()
                    hits = pc.sum(
                        pc.cast(pc.is_in(nn, value_set=av[c]), pa.int64())
                    ).as_py()
                    v = len(nn) - (hits or 0)
                kinds.append(kind)
                cols.append(c)
                viols.append(int(v))
            return pa.table(
                {"constraint": kinds, "column": cols, "violations": viols},
                schema=_SCHEMA,
            )

        folded = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["constraint", "column"])
            .aggregate(Sum("violations", alias_name="violations"))
            .take_all()
        )
        for r in folded:
            if r["constraint"] == "__nonnull":
                nonnull_counts[r["column"]] = int(r["violations"])
            else:
                rows.append((r["constraint"], r["column"], int(r["violations"])))

    for c in unique:
        from .join import hash_shard_finalize

        vals = ds.select_columns([c]).map_batches(
            lambda t: pl.from_arrow(t.drop_null()).unique().to_arrow().cast(t.schema),
            batch_format="pyarrow",
        )

        def shard_unique(t: pa.Table) -> pa.Table:
            return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

        n_distinct = hash_shard_finalize(vals, [c], shard_unique).count()
        rows.append(("unique", c, int(nonnull_counts.get(c, 0) - n_distinct)))

    for c, keys in fk.items():
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        keys = keys.drop_null()  # a null parent key is never a member
        child = ds.select_columns([c])
        if pa.types.is_integer(keys.type):
            from .sketch import semi_anti_filter_scaled

            orphans = semi_anti_filter_scaled(child, keys, c, anti=True)
        else:
            from .join import semi_anti_filter

            orphans = semi_anti_filter(child, keys, c, anti=True)
        # anti filters KEEP null rows (null is never a member); dbt
        # relationship semantics ignore null children
        v = orphans.map_batches(
            lambda t: pa.table({"n": pa.array([t.drop_null().num_rows], pa.int64())}),
            batch_format="pyarrow",
        ).sum("n") or 0
        rows.append(("fk", c, int(v)))

    rows.sort()
    return pa.table(
        {
            "constraint": [r[0] for r in rows],
            "column": [r[1] for r in rows],
            "violations": [r[2] for r in rows],
        },
        schema=_SCHEMA,
    )
