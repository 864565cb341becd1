"""Fuzzy record linkage / entity resolution (beyond-reference, SURVEY §2.11).

The reference collapses duplicates only via deterministic id hashing —
md5 over key fields, exact match (server/uuid/uuid.go:27-46) plus the
PK upsert merge (server/adapters/postgres.go:511-551). Real CDC ingest
also needs FUZZY entity resolution: the same real-world entity arriving
with spelling variants must fold to one canonical id. This module is
the classic blocking + pairwise-verify + connected-components pipeline,
Ray-Data-first:

1. distinct-value extraction — per-batch polars partials (value ->
   min id) then one small groupby: all pairwise work happens on the
   DISTINCT value table, never on rows (same gather trick the sampling
   filters use), so a 100-TB table with a bounded name vocabulary costs
   one combiner pass + a tiny shuffle.
2. blocking — a regex-extracted block key; only values sharing a block
   are compared. Partitioning assumption (documented, enforced by
   ``block_cap``): a block's distinct-value count fits one task.
3. verify — per-block batched Levenshtein: ONE numpy DP shared by all
   pairs of the block (prefix-min row recurrence, vectorized across
   pairs), chunked to bound memory. No per-pair Python DP.
4. components — union-find driver-side while the edge graph is small,
   auto-routed to the distributed min-label propagation
   (``cluster_pairs_dataset``) above a bound, like minhash dedup.
5. label gather — entity ids broadcast back to rows when the distinct
   table is small (``pc.index_in``), bucket hash join otherwise
   (recognize_users' size-guard shape).

Levenshtein here matches DuckDB's ``levenshtein()`` (unit-cost
insert/delete/substitute, codepoint-level) so the SQL oracle can verify
the whole pipeline exactly.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import once_per_process

_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _encode_names(
    names: list[str], level: str
) -> tuple[np.ndarray, np.ndarray]:
    """Symbol matrix (n, Lmax) + per-name lengths. ``level='codepoint'``
    = UTF-32 units; ``level='byte'`` = UTF-8 bytes. Padding is zeros;
    the DP only reads cells up to each pair's (la, lb)."""
    if level == "codepoint":
        enc = [s.encode("utf-32-le") for s in names]
        width = np.uint32
        unit = 4
    elif level == "byte":
        enc = [s.encode("utf-8") for s in names]
        width = np.uint8
        unit = 1
    else:
        raise ValueError(f"unknown level {level!r}")
    lens = np.fromiter((len(e) // unit for e in enc), np.int64, len(names))
    lmax = int(lens.max()) if len(names) else 0
    codes = np.zeros((len(names), max(lmax, 1)), width)
    for i, e in enumerate(enc):
        if e:
            codes[i, : lens[i]] = np.frombuffer(e, width)
    return codes, lens


def levenshtein_pairs(
    names: list[str], ai: np.ndarray, bi: np.ndarray, level: str = "codepoint"
) -> np.ndarray:
    """Unit-cost edit distance for the pairs (names[ai[k]], names[bi[k]]),
    vectorized ACROSS pairs: one rolling-row DP where the in-row left
    dependency dp[i][j-1]+1 is folded by a prefix-min scan —
    dp[i][j] = j + cummin(m[k] - k), m = min(up+1, diag+cost) — so the
    only Python loop is over the longest A-side length (~name length),
    each iteration numpy ops over (pairs, Lb).

    PARITY TRAP (measured): DuckDB's ``levenshtein()`` operates on
    UTF-8 BYTES ('' vs 'é' = 2, vs '中' = 3), not codepoints. The
    default here is the semantically-right ``level='codepoint'``; pass
    ``level='byte'`` when the threshold must match a DuckDB oracle on
    non-ASCII data. On ASCII the two are identical."""
    P = len(ai)
    if P == 0:
        return np.zeros(0, np.int64)
    codes, lens = _encode_names(names, level)
    A, B = codes[ai], codes[bi]
    la, lb = lens[ai], lens[bi]
    lamax = int(la.max())
    lbmax = int(lb.max())
    # int32 DP cells: distances are bounded by name length, and the
    # (pairs, Lb) temporaries are the verify task's peak memory
    jj = np.arange(lbmax + 1, dtype=np.int32)
    dp = np.tile(jj, (P, 1))  # row 0: distance from empty prefix = j
    res = lb.astype(np.int64)  # pairs with la == 0
    Bv = B[:, :lbmax].astype(np.int32) if lbmax else B[:, :0].astype(np.int32)
    for i in range(1, lamax + 1):
        ca = A[:, i - 1].astype(np.int32)
        cost = (Bv != ca[:, None]).astype(np.int32)
        m = np.empty_like(dp)
        m[:, 0] = i
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=m[:, 1:])
        g = m - jj
        np.minimum.accumulate(g, axis=1, out=g)
        dp = g + jj
        done = la == i
        if done.any():
            res[done] = dp[done, lb[done]]
    return res


def _distinct_values(ds, id_col: str, value_col: str, block_pattern: str):
    """(value -> min id, block key) as a small Dataset: per-batch polars
    partials (the combiner) so the groupby shuffle carries one row per
    (value, batch), then Min-fold. Nulls are dropped here; null-valued
    rows get a null entity at gather time."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, value_col]))
        out = (
            df.drop_nulls(value_col)
            .group_by(value_col)
            .agg(pl.col(id_col).min().cast(pl.Int64).alias("mid"))
            .rename({value_col: "name"})
        )
        return out.to_arrow().cast(
            pa.schema([("name", pa.string()), ("mid", pa.int64())])
        )

    names = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("name")
        .aggregate(Min("mid", alias_name="mid"))
    )

    def add_blk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.with_columns(
            pl.col("name").str.extract(block_pattern, 1).fill_null("").alias("blk")
        ).to_arrow()

    return names.map_batches(add_blk, batch_format="pyarrow")


def _make_verify_block(
    max_dist: int, block_cap: int, pair_chunk: int, level: str
):
    def verify(g: pa.Table) -> pa.Table:
        names = g["name"].to_pylist()
        mids = g["mid"].to_numpy(zero_copy_only=False)
        n = len(names)
        if n < 2:
            return _EDGE_SCHEMA.empty_table()
        if n > block_cap:
            raise ValueError(
                f"record_linkage block '{g['blk'][0].as_py()}' has {n} distinct "
                f"values > block_cap={block_cap}; choose a more selective "
                "block_pattern (the all-pairs verify is quadratic per block)"
            )
        ai, bi = np.triu_indices(n, k=1)
        keep_a, keep_b = [], []
        for lo in range(0, len(ai), pair_chunk):  # bounds the (pairs, Lb) DP
            ca, cb = ai[lo : lo + pair_chunk], bi[lo : lo + pair_chunk]
            d = levenshtein_pairs(names, ca, cb, level=level)
            sel = d <= max_dist
            keep_a.append(mids[ca[sel]])
            keep_b.append(mids[cb[sel]])
        a = np.concatenate(keep_a)
        b = np.concatenate(keep_b)
        return pa.table(
            {"a": np.minimum(a, b), "b": np.maximum(a, b)}, schema=_EDGE_SCHEMA
        )

    return verify


def record_linkage(
    ds,
    id_col: str,
    value_col: str,
    block_pattern: str = r"([^ ]+)$",
    max_dist: int = 2,
    block_cap: int = 10_000,
    # bounds the (pairs, Lb+1) DP temporaries: ~250k pairs x 31 cols x
    # 4 B x ~5 arrays ~ 150 MB peak per verify task, safe at default
    # task concurrency (2M would be ~1.2 GB and OOM-prone)
    pair_chunk: int = 250_000,
    distance_level: str = "codepoint",
    broadcast_limit_bytes: int = 64 << 20,
    driver_edge_limit: int = 200_000,
):
    """Cluster rows whose ``value_col`` strings are within ``max_dist``
    edits inside the same block; returns a Dataset ``(id_col,
    entity_id)`` where ``entity_id`` = min ``id_col`` of the entity
    (transitively closed, matching a recursive-CTE closure oracle).
    Null values get a null entity_id.

    ``block_pattern`` must be a Rust-regex/RE2 common-subset pattern
    (explicit classes like ``[^ ]`` — see ops/text.py's parity notes) so
    a DuckDB ``regexp_extract`` oracle blocks identically.
    """
    names = _distinct_values(ds, id_col, value_col, block_pattern).materialize()
    edges = (
        names.groupby("blk")
        .map_groups(
            _make_verify_block(max_dist, block_cap, pair_chunk, distance_level),
            batch_format="pyarrow",
        )
        .materialize()
    )

    n_edges = edges.count()
    if n_edges <= driver_edge_limit:
        from .dedup import cluster_pairs

        comp = cluster_pairs(
            pa.Table.from_pylist(edges.take_all(), schema=_EDGE_SCHEMA)
        )
        keys = np.fromiter(sorted(comp), np.int64, len(comp))
        vals = np.fromiter((comp[k] for k in keys), np.int64, len(comp))
    else:  # huge fuzzy-duplicate graph: distributed min-label propagation
        from .dedup import cluster_pairs_dataset

        lab = cluster_pairs_dataset(edges)
        keys = lab["doc_id"].to_numpy()  # sorted by doc_id already
        vals = lab["cluster"].to_numpy()

    def to_entity(batch: pa.Table) -> pa.Table:
        mids = batch["mid"].to_numpy(zero_copy_only=False)
        ent = mids.copy()
        if len(keys):
            idx = np.searchsorted(keys, mids)
            idx[idx >= len(keys)] = 0
            hit = keys[idx] == mids
            ent[hit] = vals[idx[hit]]
        return pa.table({"name": batch["name"], "entity_id": ent})

    # materialize BEFORE the size probe (dedup.verify_pairs convention):
    # an unmaterialized size_bytes() executes the whole labeling map an
    # extra time and may return None, mis-routing to the broadcast path
    ent_ds = names.map_batches(to_entity, batch_format="pyarrow").materialize()

    approx_bytes = ent_ds.size_bytes() or 0
    if approx_bytes <= broadcast_limit_bytes:
        rows = ent_ds.take_all()
        ref = ray.put(
            (
                pa.array([r["name"] for r in rows], pa.string()),
                pa.array([r["entity_id"] for r in rows], pa.int64()),
            )
        )

        def label(batch: pa.Table, _ref=ref) -> pa.Table:
            nm, ent = once_per_process("record_linkage_label", _ref)
            idx = pc.index_in(batch[value_col], value_set=nm)
            return pa.table(
                {id_col: batch[id_col], "entity_id": pc.take(ent, idx)}
            )

        return ds.map_batches(label, batch_format="pyarrow")

    # big distinct table: one bucket-join shuffle, nothing driver-resident
    from .join import bucket_hash_join

    left = ds.map_batches(
        lambda b: b.select([id_col, value_col]), batch_format="pyarrow"
    )
    joined = bucket_hash_join(
        left, ent_ds, value_col, "name", how="left outer"
    )
    return joined.map_batches(
        lambda b: b.select([id_col, "entity_id"]), batch_format="pyarrow"
    )
