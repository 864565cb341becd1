"""Persisted MinHash-LSH index — INCREMENTAL near-dup for continuous
ingestion.

The batch pipeline (ops/dedup.minhash_dedup) recomputes LSH buckets
over the whole corpus every run; at 100 TB with a streaming CDC source
that is the wrong shape — each window should probe what's already
indexed and only pay for its OWN documents. This module persists the
banded signature rows as a bucket-partitioned Parquet index and makes
a window's near-dup check:

    new docs  ->  band rows (same MinHasher, same seeds)
              ->  probe ONLY the touched bucket directories of the
                  index (a window touches <= num_buckets of them; the
                  window's band rows are broadcast, the index is only
                  ever SCANNED — never shuffled)
              ->  union with the window's own within-window candidates
              ->  exact-Jaccard verify, OLD texts fetched through the
                  corpus lake's zone-map/Bloom point lookup
                  (sinks/lake.LakeTable.lookup — candidate ids are few)
              ->  append the window's band rows to the index

Determinism: the same (num_perm, bands, shingle_k, seed) tuple is
pinned in the index _meta.json, so probing is exactly equivalent to
running the batch LSH over old ∪ new and keeping pairs that involve a
new doc. Writes use unique basenames per add() call (concurrent adds
don't clobber); exactly-once for a replayed window comes from the
caller's ledger, same as every other sink in this engine.

No reference analog (the reference dedups by event id only,
server/meta/redis.go events index); this is the LLM-suite streaming
complement to D1/minhash per the build brief.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..util import once_per_process
from .dedup import minhash_stage

_META = "_meta.json"


class MinHashIndex:
    def __init__(self, dir_path: str, meta: dict):
        self.dir = dir_path
        self.meta = meta

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(cls, dir_path: str, num_perm: int = 64, bands: int = 16,
               shingle_k: int = 5, seed: int = 42,
               num_buckets: int = 64) -> "MinHashIndex":
        os.makedirs(os.path.join(dir_path, "bands"), exist_ok=True)
        meta = {
            "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
            "seed": seed, "num_buckets": num_buckets,
        }
        with open(os.path.join(dir_path, _META), "w") as f:
            json.dump(meta, f)
        return cls(dir_path, meta)

    @classmethod
    def open(cls, dir_path: str) -> "MinHashIndex":
        with open(os.path.join(dir_path, _META)) as f:
            return cls(dir_path, json.load(f))

    # -- band rows ----------------------------------------------------------

    def band_rows(self, ds) -> "ray.data.Dataset":
        """(doc_id, band, band_hash, bucket) for a (doc_id, text)
        Dataset — the SAME seeded MinHasher as the batch pipeline, so
        incremental probing equals batch banding."""
        m = self.meta
        stage = minhash_stage(
            num_perm=m["num_perm"], bands=m["bands"],
            shingle_k=m["shingle_k"], seed=m["seed"],
        )
        nb = m["num_buckets"]

        def with_bucket(batch: pa.Table) -> pa.Table:
            rows = stage(batch)
            h = rows["band_hash"].to_numpy(zero_copy_only=False)
            bucket = (h.view(np.uint64) % np.uint64(nb)).astype(np.int32)
            return rows.append_column("bucket", pa.array(bucket))

        return ds.map_batches(with_bucket, batch_format="pyarrow")

    # -- write path ---------------------------------------------------------

    def add_rows(self, band_rows, files_per_add: int = 4) -> int:
        """Append precomputed band rows, bucket-partitioned. Each write
        task lands its batch under bands/bucket=N/ with a unique
        basename — concurrent adds never clobber. Band rows are
        coalesced to ``files_per_add`` write tasks first so one window
        adds O(files_per_add x touched buckets) files, not one per
        input block (probe cost tracks file count). Returns rows
        added."""
        if isinstance(band_rows, pa.Table):
            band_rows = ray.data.from_arrow(band_rows)
        root = os.path.join(self.dir, "bands")

        def write(batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                pq.write_to_dataset(
                    batch, root_path=root, partition_cols=["bucket"],
                    basename_template=f"add-{uuid.uuid4().hex}-{{i}}.parquet",
                )
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        acks = (
            band_rows.repartition(files_per_add)
            .map_batches(write, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        return int(sum(r["n"] for r in acks))

    def add(self, ds) -> int:
        return self.add_rows(self.band_rows(ds))

    # -- probe path ---------------------------------------------------------

    def probe_rows(self, new_band_rows: pa.Table,
                   exclude_ids=None) -> "ray.data.Dataset":
        """Candidate (a=new_id, b=indexed_id) pairs sharing any LSH
        bucket, as a Dataset. ``new_band_rows`` is ONE window's band
        table (small by contract — a window, not a corpus): it ships to
        the probe tasks via one ray.put, and only the touched
        bucket=N directories of the index are scanned; the index is
        never shuffled. ``exclude_ids``: ids to drop from the indexed
        side (e.g. the window itself after a crash-retry re-add)."""
        touched = sorted(
            set(new_band_rows["bucket"].to_numpy(zero_copy_only=False).tolist())
        )
        files = [
            os.path.join(d, f)
            for b in touched
            if os.path.isdir(d := os.path.join(self.dir, "bands", f"bucket={b}"))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if not files or new_band_rows.num_rows == 0:
            return ray.data.from_arrow(empty)
        ref = ray.put(new_band_rows.select(["doc_id", "band", "band_hash"]))
        excl = set(exclude_ids or [])

        def probe(batch: pa.Table) -> pa.Table:
            import polars as pl

            new = once_per_process("lsh_index.probe", ref)
            old = pl.from_arrow(batch.select(["doc_id", "band", "band_hash"]))
            if excl:
                old = old.filter(~pl.col("doc_id").is_in(sorted(excl)))
            hits = (
                pl.from_arrow(new)
                .join(old, on=["band", "band_hash"], how="inner")
                .select(
                    pl.col("doc_id").alias("a"),
                    pl.col("doc_id_right").alias("b"),
                )
                .unique()
                .to_arrow()
            )
            return hits.cast(empty.schema) if hits.num_rows else empty

        from ray.data.aggregate import Count

        cands = ray.data.read_parquet(files).map_batches(
            probe, batch_format="pyarrow"
        )
        # distinct: a pair found via several bands/files appears once
        return (
            cands.groupby(["a", "b"])
            .aggregate(Count(alias_name="__n"))
            .map_batches(
                lambda t: t.select(["a", "b"]), batch_format="pyarrow"
            )
        )


def incremental_near_dup(new_ds, index: MinHashIndex, corpus_lake,
                         threshold: float = 0.8, within_window: bool = True,
                         add: bool = True):
    """One ingestion window's near-dup pairs against everything indexed
    so far (plus, optionally, within the window itself), exact-Jaccard
    verified. Returns (pairs pa.Table(a, b, jaccard_ppm), stats dict);
    ``a`` is always a window doc, ``b`` an indexed doc or (within-window
    pairs) the larger window id.

    ``corpus_lake``: LakeTable keyed ["doc_id"] holding the indexed
    docs' text — old candidate texts come through its pruned point
    lookup, so verification cost tracks CANDIDATES, not corpus. The
    window's band rows are computed once and reused for probe and
    (``add=True``) the index append."""
    from .dedup import _shingle_hashes, _jaccard_filter, lsh_candidate_pairs

    k = index.meta["shingle_k"]
    # ONE upstream execution: band rows and verify texts both read the
    # pinned blocks, so a non-deterministic upstream (sampling, a
    # re-read of mutating input) can't hand them inconsistent views —
    # and the window pipeline doesn't run twice (round-4 review)
    new_ds = new_ds.materialize()
    # one window's band rows: window-scale (docs x bands), driver-safe
    band_batches = list(
        index.band_rows(new_ds).iter_batches(batch_format="pyarrow")
    )
    new_band = (
        pa.concat_tables(band_batches)
        if band_batches
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "band": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int32())}
        )
    )
    new_texts = {
        r["doc_id"]: r["text"]
        for b in new_ds.iter_batches(batch_format="pyarrow")
        for r in b.select(["doc_id", "text"]).to_pylist()
    }
    # exclude the window's own ids from the indexed side: after a
    # crash between add() and the caller's ledger commit, the retry
    # finds the window already indexed and would otherwise emit
    # self-pairs and reversed duplicates of every within-window pair
    # (within-window candidates are the dedicated pass below)
    cross = index.probe_rows(new_band, exclude_ids=new_texts.keys()).materialize()
    pairs = [cross.take_all()]
    if within_window:
        win = lsh_candidate_pairs(
            ray.data.from_arrow(new_band.drop_columns(["bucket"])),
            distinct=True,
        )
        pairs.append(win.take_all())
    cand = [(r["a"], r["b"]) for rows in pairs for r in rows]
    stats = {"candidates_cross": cross.count(), "candidates_window":
             len(cand) - cross.count()}
    old_ids = sorted({b for _, b in cand} - set(new_texts))
    old_texts = {}
    if old_ids:
        fetched = corpus_lake.lookup(
            [{"doc_id": i} for i in old_ids], columns=["text"]
        )
        old_texts = dict(
            zip(fetched["doc_id"].to_pylist(), fetched["text"].to_pylist())
        )
        stats["lookup"] = dict(corpus_lake.last_lookup_stats)
    texts = {**old_texts, **new_texts}
    ids_a = [a for a, b in cand if a in texts and b in texts]
    ids_b = [b for a, b in cand if a in texts and b in texts]
    sh = {i: _shingle_hashes(texts[i], k).tobytes()
          for i in set(ids_a) | set(ids_b)}
    verified = _jaccard_filter(
        ids_a, ids_b, [sh[i] for i in ids_a], [sh[j] for j in ids_b], threshold
    )
    if add:
        stats["indexed_rows"] = index.add_rows(
            ray.data.from_arrow(new_band)
        )
    stats["verified"] = verified.num_rows
    return verified, stats
