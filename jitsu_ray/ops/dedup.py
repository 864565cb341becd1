"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Extends the reference's only dedup (deterministic-id PK collapse,
SURVEY §2.7 D1) to the near-dup family a pre-training pipeline needs.

Scale design: every per-doc computation (shingling, minhash, simhash)
is a map_batches stage; the only all-to-all exchanges are groupbys on
band buckets / hash prefixes, which carry (doc_id, small-signature)
rows — never the documents themselves. Candidate verification
re-reads only candidate texts (broadcast at test scale; partitioned
semi-join at 100 TB — see verify_jaccard docstring).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import md5_hex_column

_MERSENNE = (1 << 61) - 1


_POLY_B = np.uint64(1_000_003)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Stable polynomial hashes of character k-shingles, fully vectorized:
    the UTF-8 byte string is viewed as a (n_shingles, k) strided window
    matrix and hashed with one matrix-vector product (no per-shingle
    Python loop — this stage runs over every document)."""
    s = " ".join((text or "").split())
    if len(s) < k:
        s = s.ljust(k)
    b = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) < k:  # multibyte edge: pad
        b = np.pad(b, (0, k - len(b)))
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = _POLY_B ** np.arange(k, dtype=np.uint64)  # wrapping mod 2^64
    return np.unique(windows @ powers)


def _word_ngrams(text: str, n: int = 3) -> set[int]:
    toks = (text or "").split()
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode())}
    return {zlib.crc32(" ".join(toks[i : i + n]).encode()) for i in range(len(toks) - n + 1)}


class MinHasher:
    """Actor-pool stage: doc -> (num_perm) minhash signature + LSH band
    rows. Permutation params are seeded once per actor in __init__
    (universal hashing h_i(x) = (a_i x + b_i) mod p); output is one row
    per (doc, band): (doc_id, band, band_hash) — the groupby key."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k).astype(np.uint64)
        # (num_perm, n_shingles) permuted hashes -> min per permutation
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, text in zip(ids, texts):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = zlib.crc32(chunk.tobytes())
                out_id.append(i)
                out_band.append(b)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


_HASHER_CACHE: dict = {}


def minhash_stage(num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
    """Stateless map_batches stage with a per-worker-process cached
    MinHasher: the permutation table is cheap to build, so plain tasks on
    warm workers beat an actor pool (no per-query actor startup)."""

    def run(batch: pa.Table) -> pa.Table:
        key = (num_perm, bands, shingle_k, seed)
        if key not in _HASHER_CACHE:
            _HASHER_CACHE[key] = MinHasher(num_perm, bands, shingle_k, seed)
        return _HASHER_CACHE[key](batch)

    return run


def lsh_candidate_pairs(ds, num_shards: int = 32) -> "pa.Table":
    """Candidate pairs (a < b) sharing an LSH bucket.

    Shuffles (doc_id, band, band_hash) rows into ``num_shards`` coarse
    shards by band_hash (buckets never span shards), then extracts each
    shard's pairs with one vectorized polars pass — NOT one map_groups
    call per bucket, which costs a Python invocation per (band, hash)
    group and dominated the runtime (~10^5 tiny groups per corpus)."""
    import polars as pl

    def shard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bk = pc.cast(
            pc.bit_wise_and(batch["band_hash"], num_shards - 1), pa.int32()
        )
        return batch.append_column("__shard", bk)

    def pairs_in_shard(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.select(["band", "band_hash", "doc_id"]))
        buckets = (
            df.unique()
            .group_by(["band", "band_hash"])
            .agg(pl.col("doc_id").sort().alias("ids"), pl.len().alias("n"))
            .filter(pl.col("n") >= 2)
        )
        a, b = [], []
        for ids in buckets["ids"].to_list():  # only multi-member buckets
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    out = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(pairs_in_shard, batch_format="pyarrow")
        .take_all()
    )
    if not out:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    uniq = sorted({(r["a"], r["b"]) for r in out})
    return pa.table(
        {"a": pa.array([p[0] for p in uniq], pa.int64()), "b": pa.array([p[1] for p in uniq], pa.int64())}
    )


def verify_jaccard(
    pairs: pa.Table, texts_by_id: dict[int, str], threshold: float, shingle_k: int = 5
) -> pa.Table:
    """True-Jaccard verification of candidate pairs.

    `texts_by_id` is the broadcast small side (ray.put the dict once and
    read it in actors at real scale). At 100 TB the candidate set joins
    back against the corpus by hash-partitioned doc_id instead —
    partitioning assumption: pairs-per-doc is small, so the semi-join
    side fits per-partition memory.
    """
    a_ids = pairs["a"].to_pylist()
    b_ids = pairs["b"].to_pylist()
    keep_a, keep_b, jac = [], [], []
    cache: dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        if i not in cache:
            cache[i] = _shingle_hashes(texts_by_id[i], shingle_k)
        return cache[i]

    for i, j in zip(a_ids, b_ids):
        sa, sb = sh(i), sh(j)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        val = inter / union if union else 0.0
        if val >= threshold:
            keep_a.append(i)
            keep_b.append(j)
            jac.append(val)
    return pa.table(
        {
            "a": pa.array(keep_a, pa.int64()),
            "b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


def cluster_pairs(pairs: pa.Table) -> dict[int, int]:
    """Union-find on verified pairs -> {doc_id: cluster_rep(min id)}.
    Driver-side by design: the verified-duplicate graph is orders of
    magnitude smaller than the corpus. The scale path is min-label
    propagation via iterated groupby (ray_guide near-dup recipe)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def minhash_dedup(ds, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """Full MinHash-LSH near-dup pipeline over a (doc_id, text) Dataset.
    Returns pa.Table (doc_id, cluster) for docs in near-dup clusters."""
    sig_ds = ds.map_batches(
        minhash_stage(num_perm=num_perm, bands=bands), batch_format="pyarrow"
    )
    cands = lsh_candidate_pairs(sig_ds)
    # small side broadcast: only candidate docs' texts
    cand_ids = set(cands["a"].to_pylist()) | set(cands["b"].to_pylist())
    if not cand_ids:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
    import pyarrow.compute as pc

    texts = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        m = pc.is_in(b["doc_id"], value_set=pa.array(list(cand_ids), pa.int64()))
        sel = b.filter(m)
        texts.update(zip(sel["doc_id"].to_pylist(), sel["text"].to_pylist()))
    verified = verify_jaccard(cands, texts, threshold)
    clusters = cluster_pairs(verified)
    items = sorted(clusters.items())
    return pa.table(
        {
            "doc_id": pa.array([k for k, _ in items], pa.int64()),
            "cluster": pa.array([v for _, v in items], pa.int64()),
        }
    )


class SimHasher:
    """64-bit SimHash over word tokens (crc32 token hashes, +/-1 votes
    per bit). Near-dups = small Hamming distance; bucket by 16-bit
    chunks for sub-quadratic search (4 bands tolerate distance<=3)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def simhash(text: str) -> int:
            toks = (text or "").split()
            if not toks:
                return 0
            hs = np.fromiter((zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks))
            hs = hs | (hs.astype(np.uint64) << np.uint64(32))  # widen to 64 bits
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            out = np.uint64(0)
            for k in np.nonzero(votes > 0)[0]:
                out |= np.uint64(1) << np.uint64(k)
            return int(out.astype(np.int64))  # signed view for arrow int64

        batch["simhash"] = batch["text"].map(simhash).astype("int64")
        return batch


def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.5) -> pa.Table:
    """Word n-gram Jaccard near-dup via same LSH machinery but exact
    verification on word shingles (complement to char-shingle MinHash)."""
    sig_ds = ds.map_batches(minhash_stage(num_perm=64, bands=16), batch_format="pyarrow")
    cands = lsh_candidate_pairs(sig_ds)
    cand_ids = set(cands["a"].to_pylist()) | set(cands["b"].to_pylist())
    texts = {}
    if cand_ids:
        import pyarrow.compute as pc

        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            m = pc.is_in(b["doc_id"], value_set=pa.array(list(cand_ids), pa.int64()))
            sel = b.filter(m)
            texts.update(zip(sel["doc_id"].to_pylist(), sel["text"].to_pylist()))
    keep_a, keep_b, jac = [], [], []
    ngram_cache: dict[int, set[int]] = {}

    def ng(i: int) -> set[int]:
        if i not in ngram_cache:
            ngram_cache[i] = _word_ngrams(texts[i], n)
        return ngram_cache[i]

    for i, j in zip(cands["a"].to_pylist(), cands["b"].to_pylist()):
        sa, sb = ng(i), ng(j)
        inter = len(sa & sb)
        union = len(sa | sb)
        v = inter / union if union else 0.0
        if v >= threshold:
            keep_a.append(i)
            keep_b.append(j)
            jac.append(round(v, 6))
    return pa.table(
        {
            "a": pa.array(keep_a, pa.int64()),
            "b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


def exact_dedup_hash_stage(text_col: str = "text", out: str = "text_md5"):
    """map_batches stage adding an md5(text) column; exact dedup is then
    groupby(md5) -> keep min id (D1 semantics: deterministic id + PK
    collapse)."""

    def run(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, md5_hex_column(batch[text_col], sep=""))

    return run
