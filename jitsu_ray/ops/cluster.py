"""Distributed k-means clustering over an embedding column — the
semantic-grouping primitive a training-data pipeline uses for
diversity-aware sampling, semantic dedup bucketing, and per-topic
corpus audits (the "cluster the corpus, then balance / inspect per
cluster" step of the standard LLM data recipes).

Lloyd's algorithm with a FIXED iteration count and a DETERMINISTIC
hash-order init, so the whole fit is reproducible and has an exact
chained-CTE SQL oracle twin (no RNG, no convergence-dependent stop):

- init: the k points whose ``(md5_lower64(str(id)), id)`` sorts
  smallest become centroids 0..k-1 (SQL: ``ORDER BY
  md5_number_lower(CAST(id AS VARCHAR)), id LIMIT k``).
- iterate ``iters`` times: assign every point to its nearest centroid
  (squared L2; ties break to the smallest cluster id), then recompute
  each centroid as the elementwise mean of its members (an empty
  cluster keeps its previous centroid).
- output: the final assignment pass under the fitted centroids.

Distributed shape (the 100-TB design):
- centroids are a tiny (k x d) float64 array broadcast via ``ray.put``
  once per iteration; every pass is ONE linear ``map_batches`` scan —
  no shuffle anywhere.
- the update pass emits PER-BATCH PARTIAL SUMS (k rows: cluster id,
  member count, elementwise vector sum), folded by zero-cpu TREE
  REDUCE tasks (fan-in 32) — the driver touches only the <=k-row root,
  never the k x #batches partial stream (which at 100 TB would be
  ~10^7 rows of driver fan-in). O(k*d) driver state, never points.
  This is the classic mergeable-statistic combiner shape (same
  discipline as ops/sketch and dedup's label tree reduce).
- per-batch math is one fused numpy kernel: ||v||^2 - 2 v @ C^T +
  ||c||^2 argmin over the batch matrix, float64 throughout so the SQL
  twin (DOUBLE arithmetic) agrees to summation order (~1e-16), far
  below any plausible centroid-boundary gap.

Reference anchor: the reference has no clustering surface; this is an
LLM-data-suite operator (brief: "Deduplication ... embedding-cosine
near-dup" / diversity tooling) built on the same broadcast + combiner
idioms as ops/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray



def _batch_vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column (zero-copy flat
    buffer reshape when the list column is regular). Rejects null or
    ragged rows explicitly: ``flatten()`` silently DROPS null slots, so
    without the check a divisible element count would reshape into a
    misaligned matrix (every vector garbage, assignments silently wrong)
    and a non-divisible one would die in an opaque reshape error."""
    import pyarrow.compute as pc

    col = batch[vec_col].combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    if col.null_count:
        raise ValueError(
            f"kmeans: column {vec_col!r} contains null vectors"
        )
    lens = pc.list_value_length(col)
    lo, hi = pc.min_max(lens).values()
    if lo.as_py() != hi.as_py():
        raise ValueError(
            f"kmeans: column {vec_col!r} has ragged vector lengths "
            f"({lo}..{hi}); fixed-dimension embeddings required"
        )
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("cluster", pa.int64()),
        ("n", pa.int64()),
        ("s", pa.list_(pa.float64())),
    ]
)


@ray.remote(num_cpus=0)
def _sum_merge(*tables: pa.Table) -> pa.Table:
    """One tree-reduce node: fold up to fan-in partial-sum tables into
    one <=k-row table (per cluster: total count, elementwise vector
    sum). Zero-cpu so the fold never competes with the assignment map
    tasks for CPU slots (same discipline as dedup's _min_label_merge)."""
    acc: dict[int, list] = {}
    for t in tables:
        if not t.num_rows:
            continue
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        ns = t["n"].to_numpy(zero_copy_only=False)
        sv = (
            t["s"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(t.num_rows, -1)
        )
        for c, n, v in zip(cl, ns, sv):  # <=k rows per table
            e = acc.get(int(c))
            if e is None:
                acc[int(c)] = [int(n), v.astype(np.float64, copy=True)]
            else:
                e[0] += int(n)
                e[1] += v
    ks = sorted(acc)
    return pa.table(
        {
            "cluster": pa.array(ks, pa.int64()),
            "n": pa.array([acc[c][0] for c in ks], pa.int64()),
            "s": pa.array([list(acc[c][1]) for c in ks], pa.list_(pa.float64())),
        },
        schema=_PARTIAL_SCHEMA,
    )


def _tree_fold_partials(refs: list, fan_in: int = 32) -> pa.Table:
    """Tree-reduce block refs of partial sums down to one <=k-row table.
    The driver touches only the root — at 100 TB the partials dataset is
    k x #batches rows, which a take_all would pull driver-side."""
    if not refs:
        return _PARTIAL_SCHEMA.empty_table()
    # always end with a merge call: even a single leaf block can hold
    # duplicate cluster rows (one task's block concatenates several
    # batches' k-row partials)
    while len(refs) > fan_in:
        refs = [
            _sum_merge.remote(*refs[i : i + fan_in])
            for i in range(0, len(refs), fan_in)
        ]
    return ray.get(_sum_merge.remote(*refs))


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row (squared L2, first-min tie-break
    = smallest cluster id, matching the oracle's ORDER BY dist, cluster)."""
    # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; the ||v||^2 term is
    # constant per row and can be dropped from the argmin
    d2 = -2.0 * (vecs @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans_assign(
    ds,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
    return_centroids: bool = False,
):
    """Fit deterministic k-means on ``ds[vec_col]`` and return a Dataset
    of ``(id_col, cluster int64)`` — one row per input row, the final
    assignment under the fitted centroids (with ``return_centroids`` a
    ``(dataset, centroids ndarray)`` pair — semantic_dedup composes on
    the fitted model without a second fit). See module docstring for
    the algorithm contract the SQL oracle mirrors.

    PRECONDITION for oracle parity: ``id_col`` must be UNIQUE and
    NON-NULL. The SQL twin's per-point ``row_number() PARTITION BY id``
    collapses duplicate (and all-null) ids into one output row and fans
    the kept assignment across duplicates in the mean CTE, while this
    side emits one row per input row — so duplicate ids diverge
    silently. Null-id rows here are excluded from init candidacy (the
    oracle's NULLS LAST ordering agrees whenever >= k non-null ids
    exist) but would still collapse in the oracle's output; keep ids
    unique and non-null, as every shipped caller does."""
    # ---- init: k hash-smallest points (tiny partial top-k per batch,
    # driver folds <= k * #batches candidate rows)
    from .corpus import _md5_lower64_column

    def init_candidates(batch: pa.Table) -> pa.Table:
        hs, null_mask = _md5_lower64_column(batch[id_col])
        keep = np.flatnonzero(~null_mask)
        ids = batch[id_col].take(pa.array(keep, pa.int64()))
        hs = hs[keep]
        # narrow to the k smallest hashes FIRST (plus exact boundary
        # ties of equal hash, where the id tie-break matters), so the
        # Python-object id materialization for the lexsort touches ~k
        # rows, not the whole batch
        if len(hs) > k:
            kth = np.partition(hs, k - 1)[k - 1]
            small = np.flatnonzero(hs <= kth)
        else:
            small = np.arange(len(hs))
        ids = ids.take(pa.array(small, pa.int64()))
        hs = hs[small]
        order = np.lexsort((np.asarray(ids.to_pylist()), hs))[:k]
        # gather the <=k selected rows BEFORE the float64 conversion —
        # converting the full batch matrix here would transiently hold
        # 2x the vector bytes per init task for rows it throws away
        # (null/ragged validation of the full column still happens every
        # iteration in partial_sums)
        sel = keep[small][order]
        vecs = (
            _batch_vectors(
                batch.select([vec_col]).take(pa.array(sel, pa.int64())), vec_col
            )
            if len(sel)
            else []
        )
        return pa.table(
            {
                "h": pa.array(hs[order], pa.uint64()),
                "id": ids.take(pa.array(order, pa.int64())),
                "vec": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )

    cand = ds.map_batches(init_candidates, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (r["h"], r["id"]))
    if not cand:
        raise ValueError("kmeans_assign: empty input")
    cents = np.array([r["vec"] for r in cand[:k]], dtype=np.float64)
    k = len(cents)  # fewer points than k: every point is a centroid

    # ---- Lloyd iterations: broadcast centroids, fold per-batch sums
    for _ in range(iters):
        ref = ray.put(cents)

        def partial_sums(batch: pa.Table, _ref=ref, _k=k) -> pa.Table:
            from ..util import once_per_process

            cents_b = once_per_process("kmeans_cents", _ref)
            vecs = _batch_vectors(batch, vec_col)
            if not len(vecs):
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.float64())),
                    }
                )
            a = _assign(vecs, cents_b)
            counts = np.bincount(a, minlength=_k)
            # per-dimension bincount(weights=...) — the buffered C fold;
            # np.add.at is the unbuffered scatter slow path (~10x) on
            # this per-batch-per-iteration hot loop
            sums = np.stack(
                [
                    np.bincount(a, weights=vecs[:, j], minlength=_k)
                    for j in range(vecs.shape[1])
                ],
                axis=1,
            )
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(counts[nz], pa.int64()),
                    "s": pa.array(list(sums[nz]), pa.list_(pa.float64())),
                }
            )

        root = _tree_fold_partials(
            ds.map_batches(partial_sums, batch_format="pyarrow").to_arrow_refs()
        )
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in root.to_pylist():  # <=k rows — the tree-reduce root
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]  # empty cluster keeps old

    # ---- final assignment under the fitted centroids
    ref = ray.put(cents)

    def assign_out(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        cents_b = once_per_process("kmeans_assign", _ref)
        vecs = _batch_vectors(batch, vec_col)
        a = (
            _assign(vecs, cents_b)
            if len(vecs)
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {id_col: batch[id_col], "cluster": pa.array(a, pa.int64())}
        )

    out = ds.map_batches(assign_out, batch_format="pyarrow")
    return (out, cents) if return_centroids else out


def kmeans_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
) -> str:
    """Chained-CTE DuckDB twin of ``kmeans_assign``: same hash init,
    same fixed Lloyd iterations in DOUBLE arithmetic, same tie-breaks —
    returns (id_col, cluster) for every row."""
    ctes = [
        f"e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table})",
        f"""c0 AS (
  SELECT row_number() OVER (
           ORDER BY md5_number_lower(CAST({id_col} AS VARCHAR)), {id_col}
         ) - 1 AS cluster, v AS c
  FROM e
  ORDER BY md5_number_lower(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {k})""",
    ]
    for t in range(iters):
        ctes.append(
            f"""a{t} AS (
  SELECT {id_col}, cluster FROM (
    SELECT e.{id_col}, i.cluster,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY list_distance(e.v, i.c), i.cluster) AS rn
    FROM e, c{t} i) WHERE rn = 1)"""
        )
        ctes.append(
            f"""c{t + 1} AS (
  SELECT i.cluster, COALESCE(m.c, i.c) AS c
  FROM c{t} i LEFT JOIN (
    SELECT cluster, list(mv ORDER BY idx) AS c FROM (
      SELECT cluster, idx, avg(val) AS mv FROM (
        SELECT a.cluster, generate_subscripts(e.v, 1) AS idx,
               unnest(e.v) AS val
        FROM a{t} a JOIN e USING ({id_col})
      ) GROUP BY cluster, idx
    ) GROUP BY cluster
  ) m USING (cluster))"""
        )
    ctes.append(
        f"""out AS (
  SELECT {id_col}, cluster FROM (
    SELECT e.{id_col}, i.cluster,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY list_distance(e.v, i.c), i.cluster) AS rn
    FROM e, c{iters} i) WHERE rn = 1)"""
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {id_col}, cluster FROM out"
    )


def semantic_dedup(
    ds,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
    threshold: float = 0.4,
    tile_rows: int = 4096,
):
    """SemDeDup-style semantic near-duplicate pruning (the published
    Abbas et al. 2023 recipe shape): cluster the embedding space with
    the deterministic k-means above, then WITHIN each semantic cluster
    mark every vector that has a lower-``id_col`` neighbor at cosine
    >= ``threshold`` as a duplicate — one representative (the smallest
    id of each similar group's transitive "sees a smaller near twin"
    chain) survives per near-duplicate set. Output: one row per input,
    ``(id_col, cluster int64, is_dup bool)``.

    Scale shape: the CLUSTER is the parallel unit, exactly as the
    published recipe runs it — pairwise work is confined to one
    cluster, so at corpus scale you pick k large enough (SemDeDup used
    tens of thousands) that clusters stay pairwise-tractable, and the
    one ``groupby(cluster)`` exchange moves each row once. Inside a
    group the comparison is tiled numpy (``tile_rows`` x m blocks), so
    task memory is O(m x tile), never O(m^2); compute is O(m^2 d / k)
    in aggregate — the algorithm's own bound, not an implementation
    artifact. Dedup rule "exists a smaller-id in-cluster neighbor" is
    order-free and SQL-expressible (the driver oracle joins the Lloyd
    CTEs), unlike keep-first-seen heuristics.

    Float-parity note: cosine is computed in float64 (matching DuckDB's
    list_cosine_similarity DOUBLE arithmetic to ~1e-15); pick a
    ``threshold`` with real margin from the data's pair cosines when
    hash-comparing against the SQL twin (the testdata's documented
    >=1e-4 gap at 0.4)."""

    # the fit runs here (init + Lloyd folds); the returned lazy
    # assignment dataset is unused — with_cluster re-derives assignment
    # in the same pass that carries the vectors to the prune groupby
    _lazy_assigns, cents = kmeans_assign(
        ds, id_col, vec_col, k=k, iters=iters, return_centroids=True
    )
    ref = ray.put(cents)

    def with_cluster(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        cents_b = once_per_process("semdedup_cents", _ref)
        vecs = _batch_vectors(batch, vec_col)
        a = (
            _assign(vecs, cents_b)
            if len(vecs)
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a, pa.int64()),
                vec_col: batch[vec_col],
            }
        )

    def prune_cluster(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .similarity import _normalize

        order = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        g = g.take(order)
        # zero vectors: cosine 0 vs everything (the shared _normalize
        # zero-guard; the SQL twin pins the same semantics with an
        # explicit NOT isnan() — see SQL_SEMANTIC_DEDUP)
        v = _normalize(_batch_vectors(g, vec_col).astype(np.float64))
        m = len(v)
        dup = np.zeros(m, dtype=bool)
        for start in range(0, m, tile_rows):
            end = min(start + tile_rows, m)
            sims = v[start:end] @ v.T  # (tile, m)
            tri = np.arange(m)[None, :] < np.arange(start, end)[:, None]
            dup[start:end] = ((sims >= threshold) & tri).any(axis=1)
        return pa.table(
            {
                id_col: g[id_col],
                "cluster": g["cluster"],
                "is_dup": pa.array(dup),
            }
        )

    return (
        ds.map_batches(with_cluster, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune_cluster, batch_format="pyarrow")
    )
