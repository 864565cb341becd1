"""Lake -> lake incremental replication (a maintained read replica).

``replicate(src, dst)`` folds everything committed to ``src`` since the
replica's watermark into ``dst`` by replaying the source's CHANGE DATA
FEED (:meth:`LakeTable.diff_as_of`) as one ordinary change-event window
— the downstream-replica topology every CDC deployment ends in (the
reference fans one event stream out to N destination tables,
server/destinations/; this is the same fan-out expressed lake-to-lake,
so a replica can live on cheaper storage, a different partition count,
or another cluster).

Design:
- **The replica's ledger IS the watermark.** Each replication round
  applies its delta as ``dst.apply_window(delta, frm, to)`` where
  ``frm``/``to`` are SOURCE ledger seqs — so ``dst.last_committed_hi()``
  records how far the replica has caught up, the round is idempotent
  (an already-committed window is skipped, M8), concurrent replicators
  are serialized by the ledger's optimistic seq claim, and a crash
  between diff and commit just re-derives the same delta. No second
  watermark file to keep consistent. Corollary: a replica lake must not
  receive direct writes (they would squat seq territory the source has
  not reached — detected and rejected below when the replica is AHEAD
  of the source).
- **Incremental cost is O(changes) + O(touched partitions).** The diff
  is per-source-partition with no shuffle; the apply exchange moves
  only changed rows. Delta rows all carry ``commit_seq = to``: the diff
  is a consistent state delta (one row per changed key), and ``to``
  strictly exceeds every seq a previous round wrote, so LWW converges.
- **Vacuumed history falls back to a full RE-SYNC**, not a wedge: if a
  source ``compact()`` removed the files behind the watermark, the
  round re-inserts the source's entire resolved state at ``seq = to``
  (NOT at each row's original seq — an original seq can be OLDER than
  a previous round's rewritten delta seq for the same key and lose the
  LWW race; that is only benign when the values happen to be equal,
  an invariant a uniform ``seq = to`` never has to rely on) and
  tombstones every replica key
  the source no longer has, found with one bucketed multi-key ANTI
  join (``ops/join.bucket_hash_join`` how='left anti') — never a
  driver-side key set.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["replicate"]


def _visible_cols(lake) -> list[str]:
    from ..sinks.lake import OP_COL, PART_COL, SEQ_COL

    return [
        f.name
        for f in lake.full_arrow_schema()
        if f.name not in (PART_COL, OP_COL, SEQ_COL)
    ]


def replicate(src, dst) -> dict:
    """One replication round: fold src changes since the replica
    watermark into dst. Returns ``{"mode": noop|incremental|resync,
    "from_seq", "to_seq", "rows"}``."""
    if list(src.key_cols) != list(dst.key_cols):
        raise ValueError(
            f"replica key columns {dst.key_cols} do not match the "
            f"source's {src.key_cols}"
        )
    frm = dst.ledger.last_committed_hi()
    to = src.ledger.last_committed_hi()
    if frm == to:
        return {"mode": "noop", "from_seq": frm, "to_seq": to, "rows": 0}
    if frm > to:
        raise ValueError(
            f"replica watermark {frm} is AHEAD of the source's committed "
            f"hi {to} — this lake has received non-replication writes "
            f"(or the source lake was swapped); a replica must be fed "
            f"only by replicate()"
        )
    try:
        delta = _incremental_delta(src, dst, frm, to)
        mode = "incremental"
    except FileNotFoundError:
        # source history behind the watermark was vacuumed by compact()
        delta = _resync_delta(src, dst, to)
        mode = "resync"
    entry = dst.apply_window(delta, frm, to)
    rows = int(entry.get("metrics", {}).get("rows_written", 0))
    return {"mode": mode, "from_seq": frm, "to_seq": to, "rows": rows}


def _incremental_delta(src, dst, frm: int, to: int):
    """CDC diff (frm, to] -> change-event rows at seq ``to``. Raises
    FileNotFoundError when the history behind ``frm`` is vacuumed."""
    from ..sinks.lake import OP_COL, SEQ_COL, TOMBSTONE

    diff = src.diff_as_of(frm, to)

    def to_events(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        op = pc.if_else(
            pc.equal(batch["change"], "delete"),
            pa.scalar(TOMBSTONE, pa.string()),
            pa.scalar("insert", pa.string()),
        )
        out = batch.drop_columns(["change"])
        out = out.append_column(OP_COL, op)
        return out.append_column(
            SEQ_COL, pa.array([to] * batch.num_rows, pa.int64())
        )

    return diff.map_batches(to_events, batch_format="pyarrow")


def _resync_delta(src, dst, to: int):
    """Full re-sync: the source's resolved state as inserts at ``to``
    plus anti-join tombstones for replica keys the source dropped."""
    from ..ops.join import bucket_hash_join
    from ..sinks.lake import OP_COL, SEQ_COL, TOMBSTONE

    cols = _visible_cols(src)
    key_cols = list(src.key_cols)
    payload = [c for c in cols if c not in key_cols]
    target = src.full_arrow_schema()
    event_schema = pa.schema(
        [target.field(c) for c in cols]
        + [pa.field(OP_COL, pa.string()), pa.field(SEQ_COL, pa.int64())]
    )

    def to_inserts(batch: pa.Table) -> pa.Table:
        out = batch.append_column(
            OP_COL, pa.array(["insert"] * batch.num_rows, pa.string())
        )
        return out.append_column(
            SEQ_COL, pa.array([to] * batch.num_rows, pa.int64())
        ).select(event_schema.names)

    inserts = src.read(columns=cols, as_of=to).map_batches(
        to_inserts, batch_format="pyarrow"
    )
    gone = bucket_hash_join(
        dst.read(columns=key_cols),
        src.read(columns=key_cols, as_of=to),
        key_cols,
        key_cols,
        how="left anti",
    )

    def to_tombstones(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.select(key_cols)
        for c in payload:
            out = out.append_column(c, pa.nulls(n, target.field(c).type))
        out = out.append_column(OP_COL, pa.array([TOMBSTONE] * n, pa.string()))
        return out.append_column(
            SEQ_COL, pa.array([to] * n, pa.int64())
        ).select(event_schema.names)

    return inserts.union(gone.map_batches(to_tombstones, batch_format="pyarrow"))
