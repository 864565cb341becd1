"""Probabilistic sketches — the scale paths that the exact operators
document ("swap in a sketch when the broadcast outgrows the budget"),
made real:

- ``BloomFilter``: bits-per-key membership over int64 keys, built once
  and broadcast via ``ray.put``. Used as a PREFILTER, never as the
  answer: a Bloom "no" is definite, a "yes" is a candidate that still
  gets the exact check — so ``semi_anti_filter_scaled`` is EXACT. The
  bits (~10/key) go to every worker; the exact key set is a separate
  ref fetched lazily only where Bloom positives appear (the M8
  anti-join shape; at true 100-TB key counts the exact side becomes a
  partitioned lookup instead of a ref).
- ``QuantileSketch``: mergeable bounded-size quantile summary (GK-style
  compaction of a sorted (value, weight) summary). Per-batch partials
  merge associatively, so group quantiles become one small-state
  groupby instead of co-locating every value
  (ops/corpus.exact_group_quantiles' documented upgrade path).
  Approximate by construction — rank error <= ~1/capacity — so the
  exact form stays the oracle-checkable default.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .search import TOKEN_RE

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the standard public-domain
    integer mixer; wrapping uint64 arithmetic throughout."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Vectorized Bloom filter over int64 keys (double hashing:
    probe_i = h1 + i*h2 mod m)."""

    def __init__(self, bits: np.ndarray, m: int, k: int):
        self.bits = bits  # uint8 bitset, ceil(m/8) bytes
        self.m = m
        self.k = k

    @classmethod
    def build(cls, values, fpr: float = 0.01) -> "BloomFilter":
        vals = np.asarray(values, dtype=np.int64).view(np.uint64)
        n = max(1, len(vals))
        m = int(max(64, np.ceil(-n * np.log(fpr) / (np.log(2) ** 2))))
        k = max(1, int(round(m / n * np.log(2))))
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        h1 = _splitmix64(vals)
        h2 = _splitmix64(vals ^ _MIX1) | np.uint64(1)  # odd => full cycle
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        return cls(bits, m, k)

    def contains_many(self, values) -> np.ndarray:
        vals = np.asarray(values, dtype=np.int64).view(np.uint64)
        h1 = _splitmix64(vals)
        h2 = _splitmix64(vals ^ _MIX1) | np.uint64(1)
        out = np.ones(len(vals), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out


def semi_anti_filter_scaled(ds, keys: pa.Array, col: str, anti: bool = False,
                            fpr: float = 0.01):
    """EXACT semi/anti filter with a Bloom prefilter: rows the filter
    rules out skip the exact probe entirely (for anti: a Bloom "no"
    passes immediately — no false drops); only the Bloom-positive
    candidates run the exact ``is_in``. Same result as
    ops.join.semi_anti_filter, with the exact set consulted for a small
    candidate fraction — at scale the exact side becomes a partitioned
    lookup while the broadcast is ~10 bits/key."""
    import pyarrow.compute as pc
    import ray

    key_np = np.asarray(keys.to_numpy(zero_copy_only=False), dtype=np.int64)
    bloom = BloomFilter.build(key_np, fpr)
    # SEPARATE refs: every worker fetches the bits; the exact key set is
    # fetched lazily, only by workers that ever see a Bloom-positive row
    # (an anti-join of mostly-absent keys never pulls it). The true
    # 100-TB form replaces the lazy fetch with a partitioned lookup.
    bloom_ref = ray.put(bloom)
    keys_ref = ray.put(keys)

    def run(batch: pa.Table, _bref=bloom_ref, _kref=keys_ref) -> pa.Table:
        from ..util import once_per_process

        bl = once_per_process("semi_anti_bloom_bits", _bref)
        column = batch[col].combine_chunks()
        # null-safe int extraction: to_numpy on a null-bearing int64
        # column silently converts to float64 (corrupting keys > 2^53);
        # fill nulls pre-extraction and mask them out (null is never a
        # member, matching is_in)
        null_mask = pc.is_null(column).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(column, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        maybe = bl.contains_many(vals) & ~null_mask
        # exact probe ONLY for bloom-positive rows
        exact = np.zeros(len(vals), dtype=bool)
        if maybe.any():
            ks = once_per_process("semi_anti_bloom_keys", _kref)
            idx = np.nonzero(maybe)[0]
            sub = column.take(pa.array(idx))
            exact[idx] = pc.is_in(sub, value_set=ks).to_numpy(zero_copy_only=False)
        keep = ~exact if anti else exact
        return batch.filter(pa.array(keep))

    return ds.map_batches(run, batch_format="pyarrow")


class QuantileSketch:
    """Bounded-size mergeable quantile summary: keeps at most
    ``capacity`` (value, weight) pairs; compaction collapses adjacent
    pairs (weights add), so rank error is bounded by ~total/capacity.
    merge() is associative/commutative — safe as a per-batch partial
    folded through any tree or groupby."""

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self.values = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)

    def add_many(self, vals: np.ndarray) -> "QuantileSketch":
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.values = np.concatenate([self.values, np.sort(v)])
        self.weights = np.concatenate([self.weights, np.ones(len(v), dtype=np.int64)])
        self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(max(self.capacity, other.capacity))
        out.values = np.concatenate([self.values, other.values])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compact()
        return out

    def _compact(self) -> None:
        if len(self.values) == 0:
            return
        order = np.argsort(self.values, kind="stable")
        self.values = self.values[order]
        self.weights = self.weights[order]
        n = len(self.values)
        if n <= self.capacity:
            return
        # collapse to `capacity` buckets of ~equal weight; bucket value =
        # the member covering the bucket's midpoint rank (a real sample,
        # never an average — quantiles stay members of the input)
        cum = np.cumsum(self.weights)
        total = cum[-1]
        targets = (np.arange(self.capacity) + 0.5) * (total / self.capacity)
        # n-1 forced in: without it the tail bucket (incl. the true max)
        # is dropped and merged weights stop summing to the input count
        idx = np.unique(np.append(np.searchsorted(cum, targets), n - 1))
        new_vals = self.values[idx]
        bounds = np.concatenate([[0], cum[idx][:-1]])
        new_wts = cum[idx] - bounds
        self.values, self.weights = new_vals, new_wts

    def quantile(self, q: float) -> float:
        if len(self.values) == 0:
            raise ValueError("empty sketch")
        cum = np.cumsum(self.weights)
        total = cum[-1]
        target = np.ceil(q * total)
        i = int(np.searchsorted(cum, max(1, target)))
        return float(self.values[min(i, len(self.values) - 1)])

    def to_state(self) -> dict:
        return {"v": self.values.tolist(), "w": self.weights.tolist(), "c": self.capacity}

    @classmethod
    def from_state(cls, st: dict) -> "QuantileSketch":
        out = cls(st["c"])
        out.values = np.asarray(st["v"], dtype=np.float64)
        out.weights = np.asarray(st["w"], dtype=np.int64)
        return out


def sketch_group_quantiles(ds, group_col: str, value_col: str, qs: list[float],
                           capacity: int = 512):
    """Approximate per-group quantiles via mergeable sketches: one
    sketch per group per BATCH (map_batches partial), merged per group
    in the groupby — state per group is O(capacity), never the group's
    values. The scale path of ops.corpus.exact_group_quantiles; rank
    error <= ~n_group/capacity."""
    import json

    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        gtype = batch.schema.field(group_col).type
        df = pl.from_arrow(batch.select([group_col, value_col]))
        groups, states = [], []
        for (g,), sub in df.group_by(group_col):
            sk = QuantileSketch(capacity).add_many(
                sub[value_col].drop_nulls().to_numpy()
            )
            groups.append(g)
            states.append(json.dumps(sk.to_state()))
        # pin the group key's input type: inference would null-type a
        # null key / widen an int32 one, and per-group schema drift
        # breaks Ray's block unification (round-3 ADVICE)
        return pa.table(
            {group_col: pa.array(groups, gtype), "__sk": pa.array(states, pa.string())}
        )

    def final(group: pa.Table) -> pa.Table:
        sk = QuantileSketch(capacity)
        for st in group["__sk"].to_pylist():
            sk = sk.merge(QuantileSketch.from_state(json.loads(st)))
        cols = {group_col: group[group_col].slice(0, 1).combine_chunks()}
        for q in qs:
            cols[f"q{int(round(q * 100))}"] = pa.array([sk.quantile(q)], pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


class HyperLogLog:
    """Mergeable cardinality sketch (Flajolet et al. 2007 HyperLogLog,
    the public algorithm, with the standard small-range linear-counting
    correction): ``m = 2**p`` byte registers; a 64-bit hash's top ``p``
    bits pick a register and the leading-zero count (+1) of the
    remaining bits updates it with max. merge() is a register-wise max —
    associative/commutative, so per-batch partials fold through any
    groupby. Standard error ~1.04/sqrt(m) (~1.6% at p=12 / 4 KB).
    64-bit hashing makes the classic large-range correction
    unnecessary at any realistic cardinality."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _bit_length(w: np.ndarray) -> np.ndarray:
        """Vectorized int.bit_length for uint64 (6 masked shift passes)."""
        bl = np.zeros(w.shape, dtype=np.int64)
        v = w.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            hit = (v >> np.uint64(shift)) != 0
            bl[hit] += shift
            v[hit] >>= np.uint64(shift)
        bl[w != 0] += 1
        return bl

    def add_hashed(self, hv: np.ndarray) -> "HyperLogLog":
        """Fold pre-hashed uint64 values in (hash quality is the
        caller's contract — see ``xxhash64_column``)."""
        hv = np.ascontiguousarray(hv, dtype=np.uint64)
        if len(hv) == 0:
            return self
        idx = (hv >> np.uint64(64 - self.p)).astype(np.int64)
        w = hv << np.uint64(self.p)  # remaining 64-p bits, high-aligned
        rho = (64 - self._bit_length(w) + 1).clip(max=64 - self.p + 1)
        np.maximum.at(self.regs, idx, rho.astype(np.uint8))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("cannot merge sketches of different precision")
        out = HyperLogLog(self.p)
        np.maximum(self.regs, other.regs, out=out.regs)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)  # m >= 128 constant
        e = alpha * m * m / np.sum(np.ldexp(1.0, -self.regs.astype(np.int64)))
        if e <= 2.5 * m:
            v = int(np.count_nonzero(self.regs == 0))
            if v:
                return m * np.log(m / v)  # linear counting small range
        return float(e)

    def to_state(self) -> dict:
        import base64

        return {"p": self.p, "r": base64.b64encode(self.regs.tobytes()).decode()}

    @classmethod
    def from_state(cls, st: dict) -> "HyperLogLog":
        import base64

        out = cls(st["p"])
        out.regs = np.frombuffer(
            base64.b64decode(st["r"]), dtype=np.uint8
        ).copy()
        return out


def _hash_series(s) -> np.ndarray:
    """polars Series -> uint64 hashes of its non-null values (the ONE
    place the HLL hashing contract lives)."""
    return s.drop_nulls().hash(seed=0).to_numpy().astype(np.uint64)


def xxhash64_column(col) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow column's NON-NULL values
    (polars xxhash — C speed for any dtype, no per-row Python). Only
    hash QUALITY matters to the HLL consumers, not cross-version
    stability, so this is deliberately not the md5 SQL-parity hash —
    and deliberately NOT named like ``util.hash64_column``, the
    multi-column string-concat key hash with a different contract."""
    import polars as pl

    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return _hash_series(pl.from_arrow(c))


def sketch_group_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """Approximate per-group COUNT(DISTINCT value) via mergeable HLL
    sketches: one sketch per group per BATCH (map_batches partial, 4 KB
    state at p=12), merged per group in the groupby — the shuffle
    carries O(groups x batches x 2^p) bytes, never the values. The
    scale path of ops.corpus.exact_group_distinct; output column
    ``n_distinct`` is the rounded estimate (error ~1.04/sqrt(2^p))."""
    import json

    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        gtype = batch.schema.field(group_col).type
        df = pl.from_arrow(batch.select([group_col, value_col]))
        groups, states = [], []
        for (g,), sub in df.group_by(group_col):
            groups.append(g)
            states.append(
                json.dumps(
                    HyperLogLog(p).add_hashed(_hash_series(sub[value_col])).to_state()
                )
            )
        return pa.table(
            {group_col: pa.array(groups, gtype), "__hll": pa.array(states, pa.string())}
        )

    def final(group: pa.Table) -> pa.Table:
        sk = HyperLogLog(p)
        for st in group["__hll"].to_pylist():
            sk = sk.merge(HyperLogLog.from_state(json.loads(st)))
        return pa.table(
            {
                group_col: group[group_col].slice(0, 1).combine_chunks(),
                "n_distinct": pa.array([int(round(sk.estimate()))], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


class FrequentItems:
    """Mergeable heavy-hitters summary (Misra-Gries, the public
    algorithm): at most ``capacity`` counters; overflow decrements all
    counters by the evicted weight. Guarantees: every item with true
    count > total/capacity is retained, and a retained item's counter
    undercounts its true count by at most ``error_bound()`` (the sum of
    decrements, tracked exactly). merge() adds counters then re-shrinks
    — associative up to the shared error bound, so per-batch partials
    fold through any tree/groupby. The scale path for exact top-k word
    counts (queries.q_vocab_top20's combiner): state is O(capacity)
    regardless of vocabulary size."""

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self.counts: dict = {}
        self.decremented = 0  # exact total weight removed by shrinks

    def add_many(self, items, weights=None) -> "FrequentItems":
        # shrink whenever the dict doubles the budget — interim memory
        # stays O(capacity) on a raw high-cardinality stream (the whole
        # point of the sketch), and each O(n)-cost shrink is amortized
        # over >= capacity inserts
        c = self.counts
        bound = 2 * self.capacity
        if weights is None:
            for it in items:
                c[it] = c.get(it, 0) + 1
                if len(c) > bound:
                    self._shrink()
                    c = self.counts
        else:
            for it, w in zip(items, weights):
                c[it] = c.get(it, 0) + int(w)
                if len(c) > bound:
                    self._shrink()
                    c = self.counts
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        # subtract the (capacity+1)-th largest count from everything —
        # one partition pass, drops at least one counter
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=len(self.counts))
        m = int(np.partition(vals, -self.capacity - 1)[-self.capacity - 1])
        self.counts = {k: v - m for k, v in self.counts.items() if v > m}
        self.decremented += m

    def merge(self, other: "FrequentItems") -> "FrequentItems":
        out = FrequentItems(min(self.capacity, other.capacity))
        out.counts = dict(self.counts)
        for k, v in other.counts.items():
            out.counts[k] = out.counts.get(k, 0) + v
        out.decremented = self.decremented + other.decremented
        out._shrink()
        return out

    def error_bound(self) -> int:
        """Max undercount of any retained counter (exact, not a bound
        on a bound: decrements are tracked as they happen)."""
        return self.decremented

    def top(self, k: int) -> list[tuple]:
        """Top-k (item, count_lower, count_upper) by retained counter,
        count DESC then item ASC (total order). True count lies in
        [count_lower, count_upper]."""
        err = self.decremented
        rows = sorted(self.counts.items(), key=lambda t: (-t[1], t[0]))[:k]
        return [(it, n, n + err) for it, n in rows]

    def to_state(self) -> dict:
        return {"c": self.capacity, "d": self.decremented,
                "i": list(self.counts.keys()), "n": list(self.counts.values())}

    @classmethod
    def from_state(cls, st: dict) -> "FrequentItems":
        out = cls(st["c"])
        out.counts = dict(zip(st["i"], st["n"]))
        out.decremented = st["d"]
        return out


class CountMinSketch:
    """Mergeable frequency sketch (Cormode & Muthukrishnan 2005
    Count-Min, the public algorithm): ``d`` rows x ``w`` int64 counters;
    row ``i`` scatter-adds at ``md5_lower64(f"{i}|{key}") % w`` and a
    point estimate is the min across rows — always >= the true count,
    over by at most ~2N/w with probability 1-2^-d. merge() is a
    register-wise ADD, exact and commutative, so per-batch partials fold
    through any groupby/tree AND a CDC window's delta sketch folds into
    a maintained one (the incremental shape: keep registers per lake
    table, add each window's partial — no rescan to answer "how often
    does key X appear so far").

    The row hash is deliberately the md5 SQL twin (util.md5_lower64 ↔
    DuckDB ``md5_number_lower(CAST(i AS VARCHAR) || '|' || key)``), so
    registers AND estimates are integer-exact reproducible in SQL —
    an approximate operator with a fully green oracle. md5 over unique
    keys per batch (post-combine), never per raw row."""

    def __init__(self, d: int = 4, w: int = 8192):
        if d < 1 or w < 1:
            raise ValueError("d and w must be positive")
        self.d = d
        self.w = w
        self.regs = np.zeros((d, w), dtype=np.int64)

    def _buckets(self, keys: list) -> np.ndarray:
        """(d, len(keys)) bucket ids — the ONE place the row-hash
        contract lives (str(key) canonicalization matches the oracle's
        CAST AS VARCHAR for int/string keys)."""
        from ..util import md5_lower64

        # plain-int modulus: numpy scalar % would overflow on md5
        # values >= 2^63 (Python int -> uint64 conversion refuses)
        w = self.w
        return np.stack(
            [
                np.fromiter(
                    (md5_lower64(f"{i}|{k}") % w for k in keys),
                    dtype=np.int64,
                    count=len(keys),
                )
                for i in range(self.d)
            ]
        )

    def add_counts(self, keys: list, counts) -> "CountMinSketch":
        """Fold (key, count) pairs in — counts from a per-batch combiner
        (polars group_by), so the md5 loop runs over batch-unique keys."""
        if len(keys) == 0:
            return self
        n = np.asarray(counts, dtype=np.int64)
        for i, idx in enumerate(self._buckets(keys)):
            np.add.at(self.regs[i], idx, n)
        return self

    def estimate_many(self, keys: list) -> np.ndarray:
        """Point estimates (int64, min across rows) for each key."""
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        b = self._buckets(keys)
        return np.min(self.regs[np.arange(self.d)[:, None], b], axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge sketches of different shape")
        out = CountMinSketch(self.d, self.w)
        np.add(self.regs, other.regs, out=out.regs)
        return out

    def to_cells(self) -> pa.Table:
        """Sparse register table (cell = row*w + bucket, n) — the
        groupby-friendly wire format (cells, not the dense d*w grid)."""
        rows, buckets = np.nonzero(self.regs)
        return pa.table(
            {
                "cell": pa.array(rows * self.w + buckets, pa.int64()),
                "n": pa.array(self.regs[rows, buckets], pa.int64()),
            }
        )

    @classmethod
    def from_cells(cls, cells: pa.Table, d: int, w: int) -> "CountMinSketch":
        out = cls(d, w)
        cell = cells["cell"].to_numpy(zero_copy_only=False)
        # accumulate, don't assign: ungrouped partials may repeat a cell
        # id, and keeping only the last would UNDERcount — the one error
        # direction Count-Min promises never to make
        np.add.at(
            out.regs, (cell // w, cell % w), cells["n"].to_numpy(zero_copy_only=False)
        )
        return out


def cms_from_counts(counts_ds, key_col: str, n_col: str, d: int = 4,
                    w: int = 8192) -> CountMinSketch:
    """Distributed Count-Min build over a (key, count) Dataset (the
    output of a per-batch combiner): each batch scatter-adds into a
    local sketch and emits SPARSE cells (<= d x batch-unique keys rows,
    never the d*w grid), a single-int-key Sum groupby folds cells
    globally (register adds commute, so partial order is irrelevant),
    and the driver collects <= d*w cells. Shuffle bytes are bounded by
    d x distinct keys regardless of row count; the returned sketch is
    small enough to ``ray.put`` for stream-side estimate lookups."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null keys AND null counts never reach the registers (null is
        # not a countable key, and a null count would NaN-cast to
        # INT64_MIN garbage; the oracle's GROUP BY w likewise excludes
        # unnested nulls)
        keep = pc.and_(pc.is_valid(batch[key_col]), pc.is_valid(batch[n_col]))
        valid = batch[key_col].filter(keep)
        ns = batch[n_col].filter(keep)
        sk = CountMinSketch(d, w).add_counts(
            valid.to_pylist(), ns.to_numpy(zero_copy_only=False)
        )
        return sk.to_cells()

    cells = (
        counts_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    tbl = pa.Table.from_pylist(
        cells, schema=pa.schema([("cell", pa.int64()), ("n", pa.int64())])
    )
    return CountMinSketch.from_cells(tbl, d, w)


def sketch_vocab_topk(ds, text_col: str, k: int = 20, capacity: int = 4096):
    """Approximate corpus-wide vocabulary top-k via Misra-Gries: one
    per-batch polars explode+count (the same combiner as the exact
    q_vocab_top20), folded into an O(capacity) sketch per batch, merged
    on the driver — bytes leaving the cluster are batches x capacity
    counters regardless of vocabulary size (the exact form's shuffle
    carries the full distinct vocabulary). Returns a pa.Table (word,
    n_lower, n_upper); items with true count > total/capacity are
    guaranteed present."""
    import json

    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([text_col]))
        counts = (
            df.select(pl.col(text_col).fill_null("").str.extract_all(TOKEN_RE).alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        fi = FrequentItems(capacity).add_many(
            counts["w"].to_list(), counts["n"].to_numpy()
        )
        return pa.table({"__fi": pa.array([json.dumps(fi.to_state())], pa.string())})

    states = ds.map_batches(partial, batch_format="pyarrow").take_all()
    fi = FrequentItems(capacity)
    for r in states:
        fi = fi.merge(FrequentItems.from_state(json.loads(r["__fi"])))
    top = fi.top(k)
    return pa.table(
        {
            "word": pa.array([t[0] for t in top], pa.string()),
            "n_lower": pa.array([t[1] for t in top], pa.int64()),
            "n_upper": pa.array([t[2] for t in top], pa.int64()),
        }
    )
