"""Incrementally-maintained aggregate view over a LakeTable.

``IncrementalAggView`` keeps a GROUP BY materialization (``n`` row count
+ ``sum_<col>`` per group) continuously consistent with a lake table by
folding the lake's CDC diff forward — the classic incremental
view-maintenance move (insert adds its contribution, delete retracts
its old one, update does both), never a rescan of the table.

Scale shape:
- ``refresh()`` cost is O(|changes since last refresh|) + O(|view|):
  the change stream comes from :meth:`LakeTable.diff_as_of` (one task
  per partition, no shuffle, ``include_old=True`` so old contributions
  retract without a second state read), per-batch delta partials
  collapse inside ``map_batches``, and one hash-shard exchange folds
  them per group.
- The view state itself is assumed AGGREGATE-SIZED (group cardinality,
  not table rows) and lives as one parquet file + a ``_view.json``
  watermark, swapped atomically (tmp + rename). That is the same
  contract as the schema reconciler: small consolidated state, not data.
- Refresh is idempotent: the watermark records the ledger seq the view
  reflects; a refresh at an unchanged seq is a no-op, and a crashed
  refresh never half-applies (state file and watermark swap together).

Reference anchor: the reference keeps no derived views at all — its
counters (server/meta/redis.go:40-56) are fire-and-forget metrics. This
is the exactly-consistent version a warehouse user expects, enabled by
the ledger + time-travel diff the lake already has.
"""

from __future__ import annotations

import json
import os

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["IncrementalAggView"]


class IncrementalAggView:
    """GROUP BY ``group_cols`` -> ``n`` + ``sum_<c>`` for each of
    ``value_cols``, maintained incrementally against ``lake``.

    Groups whose count falls to 0 are dropped (matching what a direct
    GROUP BY over the current state would return). Value columns must
    be numeric and non-null in live rows.
    """

    def __init__(self, view_dir: str, lake, group_cols: list[str],
                 value_cols: list[str]):
        from ..sinks.lake import OP_COL, PART_COL, SEQ_COL

        sys_cols = {OP_COL, PART_COL, SEQ_COL}
        bad = [c for c in [*group_cols, *value_cols] if c in sys_cols]
        if bad:
            raise ValueError(
                f"lake system columns cannot be view columns: {bad} "
                f"(they are not part of the visible state the CDC diff "
                f"compares)"
            )
        self.dir = view_dir
        self.lake = lake
        self.group_cols = list(group_cols)
        self.value_cols = list(value_cols)
        self.sums = [f"sum_{c}" for c in value_cols]
        os.makedirs(view_dir, exist_ok=True)
        self._meta_path = os.path.join(view_dir, "_view.json")
        self._state_path = os.path.join(view_dir, "state.parquet")

    # -- state ---------------------------------------------------------------

    def last_seq(self) -> int:
        try:
            with open(self._meta_path) as f:
                return json.load(f)["last_seq"]
        except FileNotFoundError:
            return 0

    def _state_schema(self) -> pa.Schema:
        target = self.lake.full_arrow_schema()
        return pa.schema(
            [target.field(c) for c in self.group_cols]
            + [pa.field("n", pa.int64())]
            + [pa.field(s, pa.int64()) for s in self.sums]
        )

    def read(self) -> pa.Table:
        """Current view contents (aggregate-sized by contract)."""
        if not os.path.exists(self._state_path):
            return self._state_schema().empty_table()
        return pq.read_table(self._state_path)

    # -- maintenance ---------------------------------------------------------

    def refresh(self) -> dict:
        """Fold all lake changes since the last refresh into the view.

        Returns ``{"from_seq", "to_seq", "changed_groups"}``; a no-op
        (view already current) returns ``changed_groups=0`` without
        touching the state file.
        """
        frm = self.last_seq()
        to = self.lake.ledger.last_committed_hi()
        if to == frm:
            return {"from_seq": frm, "to_seq": to, "changed_groups": 0}
        diff = self.lake.diff_as_of(
            frm, to, columns=self.group_cols + self.value_cols,
            include_old=True,
        )
        gcols, vcols, sums = self.group_cols, self.value_cols, self.sums
        # a group/value column that is a lake KEY has no __old sibling
        # (keys are identical on both diff sides by construction)
        keys = set(self.lake.key_cols)
        bad = [c for c in vcols if c in keys]
        if bad:
            raise ValueError(f"value columns cannot be lake key columns: {bad}")
        old_g = {c: (c if c in keys else f"{c}__old") for c in gcols}

        def delta_partial(batch: pa.Table) -> pa.Table:
            """Per-batch delta combiner: +new contribution for
            insert/update rows, -old contribution for delete/update rows
            (an update whose group did not move cancels its own n)."""
            df = pl.from_arrow(batch)
            add = df.filter(pl.col("change") != "delete").select(
                *gcols,
                pl.lit(1, pl.Int64).alias("n"),
                *[pl.col(c).cast(pl.Int64).alias(s) for c, s in zip(vcols, sums)],
            )
            sub = df.filter(pl.col("change") != "insert").select(
                *[pl.col(old_g[c]).alias(c) for c in gcols],
                pl.lit(-1, pl.Int64).alias("n"),
                *[
                    (-pl.col(f"{c}__old")).cast(pl.Int64).alias(s)
                    for c, s in zip(vcols, sums)
                ],
            )
            out = (
                pl.concat([add, sub])
                .group_by(gcols)
                .agg(pl.sum("n"), *[pl.sum(s).alias(s) for s in sums])
            )
            return out.to_arrow()

        from ..ops.join import hash_shard_finalize

        def fold(group: pa.Table) -> pa.Table:
            df = pl.from_arrow(group)
            return (
                df.group_by(gcols)
                .agg(pl.sum("n"), *[pl.sum(s).alias(s) for s in sums])
                .to_arrow()
            )

        state = pl.from_arrow(self.read())
        parts = list(
            hash_shard_finalize(
                diff.map_batches(delta_partial, batch_format="pyarrow"),
                gcols,
                fold,
            ).iter_batches(batch_format="pyarrow")
        )
        deltas = (
            pl.from_arrow(pa.concat_tables(parts))
            if parts
            else pl.from_arrow(self._state_schema().empty_table())
        )
        merged = (
            pl.concat([state, deltas.select(state.columns)])
            .group_by(gcols)
            .agg(pl.sum("n"), *[pl.sum(s).alias(s) for s in sums])
            .filter(pl.col("n") > 0)
        )
        out = merged.to_arrow().cast(self._state_schema())
        tmp = self._state_path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, self._state_path)
        mt = self._meta_path + ".tmp"
        with open(mt, "w") as f:
            json.dump({"last_seq": to}, f)
        os.replace(mt, self._meta_path)
        return {
            "from_seq": frm,
            "to_seq": to,
            "changed_groups": int(deltas.height),
        }
