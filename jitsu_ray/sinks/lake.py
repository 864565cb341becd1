"""Partitioned last-writer-wins Parquet lake table.

The sink half of the CDC engine. Semantics are lifted from the
reference's upsert destinations — ClickHouse ReplacingMergeTree with a
version column (server/adapters/clickhouse.go:155-190) and Postgres
``INSERT ... ON CONFLICT DO UPDATE`` (server/adapters/postgres.go:49,
511-551) — but made *exact* and order-independent: for every key the
row with the maximum ``commit_seq`` wins, and wins as a tombstone if
that row is a delete. A later re-insert (higher seq) resurrects the key.

Physical design (LSM-ish, append-only):

    lake_dir/
      _meta.json                    # key cols, partition count, hash algo
      _schema/v000001.json          # logical payload schema versions
      _ledger/00000001.json ...     # commit log (state/ledger.py)
      part=00007/delta-<lo>-<hi>.parquet   # one window's winners for part 7
      part=00007/base-<n>.parquet          # compacted state

Applying a window only *appends* per-partition delta files containing
the window's per-key winners — O(window), never O(table) — so ingest
throughput is independent of accumulated table size. Resolution
(per-key argmax over base+deltas, drop tombstones) happens at read time
and is folded down by ``compact()``; both are per-partition and
shuffle-free because every key hashes to exactly one partition for the
table's lifetime.

Scale notes (the 100 TB design points):
  * The only all-to-all exchange per window is the hash partition of
    the window's events — after a per-batch combiner has already
    collapsed duplicate keys, so the shuffle carries at most (unique
    keys in window) rows. The exchange is an EXPLICIT hash exchange
    into a pool of stateful merger actors rather than
    ``groupby("__part")``: Ray 2.49's sort-based shuffle partitions
    blocks into zero-copy slices whose serialization ships the whole
    parent block per slice — on wide large_string rows that is a
    ~40x shuffle write amplification (measured: 2M x 800B rows took
    30s at 32 CPUs and anti-scaled vs 8 CPUs), and the hash-shuffle
    strategy crashes on empty partitions in this version. The manual
    exchange sends trimmed ``take()`` copies directly to the actor
    that owns the partition, so bytes moved = bytes needed.
  * Hot repos are handled by hashing the full (repo, path) key: a
    Zipf-heavy repo's files spread uniformly over partitions. A single
    hot *key* is irreducible (its events must meet in one group) but
    the per-key merge is a cheap argmax.
  * Wide rows (multi-MB ``content``) stay in Arrow large_string; every
    stage is ``batch_format="pyarrow"``; nothing converts to pandas.
  * Writes are resumable/idempotent: delta paths are deterministic per
    NORMAL window (forced windows get unique tags — they may share
    bounds with a committed window they must never overwrite) and
    invisible until the ledger row lands (state/ledger.py).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import polars as pl
import ray
import ray.data

from ..schema.reconciler import LakeSchema, observed_payload
from ..state.ledger import Ledger
from ..types import DataType, from_arrow, to_arrow
from ..util import (
    HASH_ALGO,
    hash64_column,
    hash_mod_column,
    hash_route_column,
    pad_and_cast,
)


def _byte_bounded_groups(files: list[str], budget: int) -> list[list[str]]:
    """Consecutive runs of ``files`` (ledger order) whose on-disk bytes
    stay within ``budget`` — the shared grouping rule of size-tiered
    compaction and byte-bounded splits. The first file of a run always
    joins even when alone over budget, so an oversized file forms its
    own singleton group (compaction passes it through; a split still
    processes it file-at-a-time)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > budget:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def active_moduli(base: int, splits: list) -> dict[int, int]:
    """{active partition id: its routing modulus} under a split
    topology — the base partitions minus split parents plus their
    children, folded in commit order (a child with the parent's id at
    the refined modulus is a distinct node; the dict keeps the deepest
    modulus, matching hash_route_column's descent)."""
    act = {p: base for p in range(base)}
    for sid, m, f in splits:
        if act.get(sid) == m:
            act.pop(sid)
            for j in range(f):
                act[sid + j * m] = m * f
    return act

OP_COL = "op"
SEQ_COL = "commit_seq"
PART_COL = "__part"
TOMBSTONE = "delete"


def resolve_arrow(tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    """Read-side resolution: per-key LWW winners with tombstones dropped."""
    if tbl.num_rows == 0:
        return tbl
    win = resolve_keep_tombstones(tbl, key_cols)
    return win.filter(pc.not_equal(win[OP_COL], TOMBSTONE))


@ray.remote(num_cpus=0)
def _split_block(block: pa.Table, pool_size: int):
    """Slice one prepped block into per-merger-group sub-tables
    (group = __part % pool_size, matching the pool's partition
    assignment). Called with ``num_returns=pool_size`` so every group
    lands in its OWN object: the merger that owns group g fetches only
    object g — on a multi-node cluster network bytes per window equal
    window bytes, not window x pool (the round-1 design shipped every
    block ref to every merger). Scheduled zero-cpu: the work is one
    argsort + pool_size takes, and locality puts it on the node that
    produced the block, so co-located mergers keep plasma zero-copy.
    ``take`` (not ``slice``) compacts each group into fresh buffers —
    a zero-copy slice would serialize its whole parent block
    (the measured ~40x amplification pitfall)."""
    import numpy as np

    if block.num_rows == 0 or PART_COL not in block.column_names:
        return (block,) * pool_size if pool_size > 1 else block
    from ..util import group_take_indices

    g = block[PART_COL].to_numpy(zero_copy_only=False) % pool_size
    out = tuple(block.take(idx) for idx in group_take_indices(g, pool_size))
    return out if pool_size > 1 else out[0]


def _write_key_bloom(tbl: pa.Table, key_cols: list[str], parquet_path: str) -> str:
    """Per-file key Bloom sidecar (``<file>.bloom.npz``) over the
    64-bit composite-key hash — the point-lookup complement to zone
    maps: hash-partitioned string keys (repo/path) span the whole
    alphabet in EVERY delta file, so [min,max] never prunes them, while
    a ~10-bits/key Bloom skips a file for any absent key with ~1% false
    positives. Written tmp+rename next to the (already deterministic)
    delta path, so idempotent window retries converge. A Bloom "maybe"
    still reads the parquet — pruning stays exact."""
    from ..ops.sketch import BloomFilter
    from ..util import hash64_column

    keys = pl.from_arrow(tbl.select(key_cols)).unique().to_arrow()
    bf = BloomFilter.build(hash64_column(keys, key_cols).to_numpy(zero_copy_only=False))
    import numpy as np

    path = parquet_path + ".bloom.npz"
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, bits=bf.bits, m=np.int64(bf.m), k=np.int64(bf.k))
    os.replace(tmp, path)
    return path


def _bloom_may_contain(parquet_path: str, key_hashes) -> bool:
    """Probe a file's Bloom sidecar; a missing/corrupt sidecar never
    prunes (legacy files, partial writes)."""
    import numpy as np

    from ..ops.sketch import BloomFilter

    path = parquet_path + ".bloom.npz"
    try:
        with np.load(path) as z:
            bf = BloomFilter(z["bits"], int(z["m"]), int(z["k"]))
    except Exception:  # missing, truncated (EOFError/BadZipFile), garbage
        return True  # — ANY unreadable sidecar must fail open, never prune
    return bool(bf.contains_many(key_hashes).any())


def _key_zone_stats(tbl: pa.Table, key_cols: list[str]) -> dict:
    """Per-key-column [min, max] zone map for one delta/base file —
    recorded in its ledger entry so key lookups can skip files whose
    range excludes every requested key (the lakehouse file-statistics
    idea, derived from the ledger instead of parquet footers: at 100 TB
    the ledger scan is one small-file read vs millions of footer
    fetches). A column with any NULL key or a non-JSON-serializable
    bound is recorded [None, None] = never prunable — pruning must only
    ever skip files that provably lack the key."""
    out = {}
    for c in key_cols:
        bounds = [None, None]
        # schema evolution: a window written before a stats column
        # existed simply records unprunable bounds for it
        if c in tbl.column_names:
            col = tbl[c]
            if len(col) and col.null_count == 0:
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if isinstance(lo, (str, int, float, bool)):
                    bounds = [lo, hi]
        out[c] = bounds
    return out


@ray.remote(num_cpus=0)
def _lookup_partition(
    files: list[str],
    ktab: pa.Table,
    target: pa.Schema,
    phys_cols: list[str],
    key_cols: list[str],
    out_cols: list[str],
) -> pa.Table:
    """One partition's pruned point lookup: read only the zone-map-kept
    files, exact semi-join to the requested keys (polars, composite-key
    safe), then LWW-resolve — resolution over just the key's own rows
    equals global resolution because a key's versions all live here.
    Zero-cpu: a handful of row-group reads, scheduled without starving
    pipeline stages."""
    t = pq.ParquetDataset(files, schema=target).read(columns=phys_cols)
    hit = (
        pl.from_arrow(t)
        # nulls_equal: IS NOT DISTINCT FROM key equality — a requested
        # NULL key must match the lake's null-keyed row (partition
        # routing and the Bloom sidecar already treat it as a real key
        # via fill_null(''); the semi join must not drop it at the end)
        .join(pl.from_arrow(ktab), on=key_cols, how="semi", nulls_equal=True)
        .to_arrow()
        .cast(t.schema)
    )
    return resolve_arrow(hit, key_cols).select(out_cols)


def _zone_may_contain(stats: dict, keys: pa.Table) -> bool:
    """True unless the zone map proves NO requested key is in the file:
    a key matches iff every key column lies within that column's
    [min, max]; missing / None bounds never prune."""
    import numpy as np

    mask = np.ones(keys.num_rows, dtype=bool)
    for c in keys.column_names:
        b = stats.get(c)
        if not b or b[0] is None:
            continue
        v = keys[c]
        ge = pc.fill_null(pc.greater_equal(v, b[0]), False)
        le = pc.fill_null(pc.less_equal(v, b[1]), False)
        mask &= pc.and_(ge, le).to_numpy(zero_copy_only=False)
        if not mask.any():
            return False
    return bool(mask.any())


@ray.remote(num_cpus=0, max_restarts=0)
class PartitionMerger:
    """Stateful merger actor: owns a fixed set of lake partitions for the
    lifetime of a replay run (T4/J3 analog — the reference's per-table
    upsert writer behind an etcd lock; here the partition assignment IS
    the lock). Receives trimmed per-partition sub-tables during a
    window, folds them incrementally (LWW keep-tombstones), and on
    ``finish`` writes one delta file per touched partition.

    num_cpus=0: ingest work is tiny and finish-time work is write-IO
    bound; reserving whole CPUs would starve the read/prep stages
    (actor-pool sizing note in SURVEY §7.2).
    """

    FOLD_ROWS = 500_000  # buffered rows before an incremental LWW fold

    def __init__(
        self,
        lake_dir: str,
        key_cols: list[str],
        my_parts: list[int],
        stats_cols: list[str] | None = None,
    ):
        self.lake_dir = lake_dir
        self.key_cols = key_cols
        self.my_parts = sorted(my_parts)
        self.stats_cols = list(stats_cols or [])
        self.buf: list[pa.Table] = []
        self.buf_rows = 0

    def ingest_block(self, block: pa.Table) -> int:
        """Ingest a pre-split slice holding ONLY this merger's rows
        (apply_window routes each split output to its owning actor, so
        across nodes network bytes = owned bytes, not window x pool).
        The isin filter stays as a cheap correctness belt: a slice that
        somehow carries foreign rows is trimmed, and whole shared
        blocks (the pre-split-less path) still work."""
        import numpy as np

        # 0-row map outputs surface as schema-less blocks; nothing to own
        if block.num_rows == 0 or PART_COL not in block.column_names:
            return 0
        pvals = block[PART_COL].to_numpy(zero_copy_only=False)
        idx = np.nonzero(np.isin(pvals, self.my_parts))[0]
        if idx.size == 0:
            return 0
        if idx.size == block.num_rows:
            self.buf.append(block)
        else:
            self.buf.append(block.take(idx))
        self.buf_rows += idx.size
        if self.buf_rows >= self.FOLD_ROWS:
            folded = resolve_keep_tombstones(
                pa.concat_tables(self.buf), self.key_cols
            )
            self.buf = [folded]
            self.buf_rows = folded.num_rows
        return int(idx.size)

    def finish(self, window_tag: str) -> list[dict]:
        import numpy as np

        out = []
        if self.buf:
            all_mine = resolve_keep_tombstones(
                pa.concat_tables(self.buf), self.key_cols
            )
            pvals = all_mine[PART_COL].to_numpy(zero_copy_only=False)
            for p in self.my_parts:
                idx = np.nonzero(pvals == p)[0]
                if idx.size == 0:
                    continue
                merged = all_mine.take(idx)
                part_dir = os.path.join(self.lake_dir, f"part={p:05d}")
                os.makedirs(part_dir, exist_ok=True)
                rel = f"part={p:05d}/delta-{window_tag}.parquet"
                final = os.path.join(self.lake_dir, rel)
                fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
                os.close(fd)
                pq.write_table(merged, tmp)
                os.replace(tmp, final)  # deterministic path => idempotent retry
                _write_key_bloom(merged, self.key_cols, final)
                n_tomb = merged.filter(pc.equal(merged[OP_COL], TOMBSTONE)).num_rows
                out.append(
                    {
                        "part": p,
                        "file": rel,
                        "rows": merged.num_rows,
                        "tombstones": n_tomb,
                        "bytes": os.path.getsize(final),
                        "key_stats": _key_zone_stats(
                            merged, self.key_cols + self.stats_cols
                        ),
                    }
                )
        self.buf = []
        self.buf_rows = 0
        return out


class LakeTable:
    def __init__(self, lake_dir: str):
        from ..util import hash_self_test

        self.dir = lake_dir
        with open(os.path.join(lake_dir, "_meta.json")) as f:
            meta = json.load(f)
        # a lake written under a different partition hash (or a polars
        # whose xxhash64 drifted) must not be opened: rows would be
        # routed to the wrong partition and LWW resolution would break
        if meta.get("hash_algo", HASH_ALGO) != HASH_ALGO:
            raise RuntimeError(
                f"lake {lake_dir} was written with hash_algo="
                f"{meta.get('hash_algo')!r}, this build uses {HASH_ALGO!r}"
            )
        hash_self_test()
        self.key_cols: list[str] = meta["key_cols"]
        # physical key-column types, frozen at creation / first window
        # (reference: server/adapters/table.go:13-23 — a Table preserves
        # its columns' physical types; keys are never retyped). Stored as
        # logical-lattice names; absent (legacy lakes) => STRING. Frozen
        # because the partition hash stringifies key values — retyping a
        # key (int 5 -> float 5.0) would re-route rows mid-table.
        self.key_types: dict[str, DataType] = {
            k: DataType[v] for k, v in meta.get("key_types", {}).items()
        }
        self.num_partitions: int = meta["num_partitions"]
        self.stats_cols: list[str] = list(meta.get("stats_cols", []))
        # creation UUID (None on legacy lakes created before it existed);
        # replication records it so a same-path recreated source is caught
        self.lake_id: str | None = meta.get("lake_id")
        self.schema_dir = os.path.join(lake_dir, "_schema")
        self.ledger = Ledger(os.path.join(lake_dir, "_ledger"))
        self.schema = LakeSchema.load(self.schema_dir)
        self._mergers: list | None = None
        self._merger_parts: tuple | None = None
        # exchange routing: "shared" hands every merger the same block
        # ref (plasma reads are zero-copy when the pool is co-located on
        # one node); "split" pre-slices each block per merger group so
        # cross-node traffic = owned bytes. "auto" picks by topology.
        self.exchange_mode: str = "auto"

    def _merger_pool(self, active: list[int]) -> list:
        """Merger actors, created once per LakeTable instance and reused
        across windows (actor startup amortized; buffers cleared at each
        window's finish) — rebuilt when a partition SPLIT changed the
        active id set (a stale pool would still claim the split parent
        and no one would own the children). Pool size =
        min(active partitions, cluster CPUs / 2)."""
        if self._mergers is not None and self._merger_parts != tuple(active):
            for h in self._mergers:
                try:
                    ray.kill(h)
                except Exception:
                    pass
            self._mergers = None
        if self._mergers is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            # cap at half the CPUs: a pool of exactly `cpus` zero-cpu actors
            # 1:1 with `cpus` blocked exchange tasks collapses throughput
            # (measured 15x on a 2M-row window); half leaves slots for the
            # read/prep/split stages to stream concurrently
            # JITSU_MERGER_POOL pins the pool size irrespective of CPU
            # count — used by bench.py --scaling to hold the pool equal
            # across parallelism levels (round-1 verdict: pool scaling
            # with cpus confounded the 4->16 efficiency number)
            m = int(os.environ.get("JITSU_MERGER_POOL", "0")) or max(
                1, min(len(active), cpus // 2)
            )
            self._mergers = [
                PartitionMerger.remote(
                    self.dir,
                    self.key_cols,
                    [p for p in active if p % m == a],
                    self.stats_cols,
                )
                for a in range(m)
            ]
            self._merger_parts = tuple(active)
        return self._mergers

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        lake_dir: str,
        key_cols: list[str],
        num_partitions: int = 64,
        key_types: dict[str, "DataType | str"] | None = None,
        stats_cols: list[str] | None = None,
    ) -> "LakeTable":
        """``key_types`` optionally pins the key columns' logical types at
        creation (DataType or its name); keys not listed are recorded from
        the first applied window's observed schema instead.

        ``stats_cols``: non-key columns whose per-file [min, max] zone
        maps are recorded in every ledger row alongside the key stats —
        the data-skipping input for ``scan_range``. Frozen at creation
        (files written before a column was tracked are simply never
        prunable on it)."""
        os.makedirs(lake_dir, exist_ok=True)
        os.makedirs(os.path.join(lake_dir, "_schema"), exist_ok=True)
        meta_path = os.path.join(lake_dir, "_meta.json")
        if not os.path.exists(meta_path):
            kt = {
                k: (v.name if isinstance(v, DataType) else DataType[str(v)].name)
                for k, v in (key_types or {}).items()
            }
            import uuid

            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "key_cols": list(key_cols),
                        "key_types": kt,
                        "num_partitions": num_partitions,
                        "hash_algo": HASH_ALGO,
                        "stats_cols": list(stats_cols or []),
                        # creation identity: lets a replica detect a source
                        # lake DELETED AND RECREATED AT THE SAME PATH (path
                        # identity alone cannot — realpath matches and a
                        # fresh ledger's seqs can collide with the recorded
                        # position, turning every round into a silent noop)
                        "lake_id": uuid.uuid4().hex,
                    },
                    f,
                )
        return cls(lake_dir)

    @classmethod
    def open(cls, lake_dir: str) -> "LakeTable":
        return cls(lake_dir)

    # -- schema -------------------------------------------------------------

    @property
    def system_cols(self) -> set[str]:
        return {OP_COL, SEQ_COL, PART_COL, *self.key_cols}

    def full_arrow_schema(self) -> pa.Schema:
        fields = [
            pa.field(PART_COL, pa.int32()),
            pa.field(OP_COL, pa.string()),
            pa.field(SEQ_COL, pa.int64()),
        ]
        fields += [
            pa.field(k, to_arrow(self.key_types.get(k, DataType.STRING)))
            for k in self.key_cols
        ]
        fields += self.schema.to_arrow_fields()
        return pa.schema(fields)

    def _ensure_key_types(self, ds_schema: pa.Schema) -> None:
        """Record any still-unrecorded key column's logical type from the
        first window's observed schema, then freeze it in _meta.json.
        UNKNOWN (all-null) observations stay unrecorded so a later window
        with real values can still pin the type.

        A LEGACY lake (created before key_types existed) that already
        holds committed windows stored its keys stringified — pin STRING
        for those, never the incoming window's type, or
        full_arrow_schema() would conflict with the existing files."""
        missing = [k for k in self.key_cols if k not in self.key_types]
        if not missing:
            return
        if self.ledger.last_committed_hi() > 0:
            for k in missing:
                self.key_types[k] = DataType.STRING
            self._save_meta()
            return
        names = set(ds_schema.names)
        changed = False
        for k in missing:
            if k not in names:
                continue
            lt = from_arrow(ds_schema.field(k).type)
            if lt == DataType.UNKNOWN:
                continue
            self.key_types[k] = lt
            changed = True
        if changed:
            self._save_meta()

    def _save_meta(self) -> None:
        """Persist key_types into _meta.json under a self-healing pid
        lock (util.acquire_pid_lock — a crashed writer's stale lock is
        broken once its pid is verifiably dead): the read-modify-write
        would otherwise race between two concurrent FIRST-window writer
        processes (the documented T4 scenario) and pin different key
        dtypes into one lake's meta and delta files. Inside the lock,
        any key a concurrent writer already pinned wins
        (first-writer-wins, mirroring the frozen key-type contract) and
        this writer adopts it so its own deltas are cast to the same
        physical type."""
        from ..util import acquire_pid_lock, release_pid_lock

        meta_path = os.path.join(self.dir, "_meta.json")
        lock = meta_path + ".lock"
        acquire_pid_lock(lock)
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            for k, v in meta.get("key_types", {}).items():
                self.key_types[k] = DataType[v]  # concurrent pin wins
            meta["key_types"] = {k: t.name for k, t in self.key_types.items()}
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, meta_path)
        finally:
            release_pid_lock(lock)

    def use_shared_schema_actor(self, name: str | None = None) -> None:
        """Route schema reconciliation through a named SchemaReconcilerActor
        (get-or-create) — the T4 concurrent-writers path: several
        LakeTable writer processes sharing one lake serialize their
        schema widenings through the actor instead of racing on the
        _schema dir (reference: per-table etcd lock around DDL,
        server/storages/table_helper.go)."""
        from ..schema.reconciler import SchemaReconcilerActor

        actor_name = name or f"jitsu_schema::{os.path.abspath(self.dir)}"
        self._schema_actor = SchemaReconcilerActor.options(
            name=actor_name, get_if_exists=True, lifetime="detached"
        ).remote(self.schema_dir)

    def _reconcile_window_schema(self, ds_schema: pa.Schema) -> None:
        observed = observed_payload(ds_schema, self.system_cols)
        if getattr(self, "_schema_actor", None) is not None:
            state = ray.get(
                self._schema_actor.reconcile.remote({n: int(t) for n, t in observed.items()})
            )
            # a concurrent writer may have widened further between the
            # actor reply and this load — loading a NEWER (strictly
            # additive) version is safe; older would mean a lost write
            self.schema = LakeSchema.load(self.schema_dir)
            if self.schema.version < state["version"]:
                raise RuntimeError(
                    f"schema dir version {self.schema.version} behind actor "
                    f"version {state['version']} — non-atomic schema save?"
                )
            return
        if self.schema.reconcile(observed):
            # Additive + idempotent: persisting before the ledger commit is
            # safe (a crashed window leaves a wider schema, which re-running
            # the window reproduces).
            self.schema.save(self.schema_dir)

    # -- write path ---------------------------------------------------------

    def apply_window(
        self,
        ds: "ray.data.Dataset",
        lo: int,
        hi: int,
        extra_metrics: dict | None = None,
        force: bool = False,
    ) -> dict:
        """Apply one micro-batch window of change events.

        ``ds`` must contain op, commit_seq, the key columns, and any
        payload columns. Returns the committed ledger entry.

        ``force=True`` bypasses the already-committed skip — the
        RECOVERY path (Replayer.replay_spooled): a spooled window whose
        (lo, hi] the stream has already advanced past must still be
        applied at its ORIGINAL bounds so the watermark never claims seq
        territory that was never read. A forced window whose (lo, hi]
        collides with an already-committed window's gets a SUFFIXED
        file tag so it can never overwrite that window's delta files
        (a re-apply of the SAME content just adds an equal-content file
        the LWW fold resolves identically).
        """
        if not force and hi <= self.ledger.last_committed_hi():
            # Idempotent replay: window already committed (M8 / D3 analog —
            # the "already uploaded" skip, logfiles/uploader.go:103-109).
            return {"kind": "window", "lo": lo, "hi": hi, "skipped": True}

        import time as _time

        _t0 = _time.perf_counter()

        in_schema = ds.schema()
        if in_schema is not None:
            # a zero-BLOCK window (e.g. a replication re-sync of an empty
            # source) has no schema; there is nothing to pin or reconcile,
            # but the window must still COMMIT so the watermark advances
            self._ensure_key_types(in_schema.base_schema)
            self._reconcile_window_schema(in_schema.base_schema)
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        num_parts = self.num_partitions
        # routing topology, read fresh per window: a partition split
        # committed since the last window must re-route THIS window's
        # rows (splits are maintenance ops — they must not interleave
        # with a concurrently-applying window, same contract as compact
        # + the topology break rule in Ledger.live_files)
        splits = self.ledger.splits()
        window_tag = f"{lo:012d}-{hi:012d}"
        if force:
            # A forced window may share (lo, hi] with a DIFFERENT
            # previously-committed window (a late spool recovery at its
            # original bounds after the stream advanced past them, a
            # repeated resync repair at frm == to). The deterministic
            # tag would then OVERWRITE that window's delta files on
            # disk — silent data loss the ledger cannot see (both rows
            # would point at one file; found by the randomized
            # interleaving property test). Forced windows therefore get
            # an ALWAYS-UNIQUE tag: ledger position + random suffix.
            # Uniqueness (rather than a probe-until-free loop) also
            # rules out (a) resurrecting a compaction-VACUUMED plain
            # tag whose file is gone from disk but whose ledger row
            # still names the path under older time-travel views, and
            # (b) two CONCURRENT forced appliers racing one existence
            # probe to the same "free" tag — the ledger's optimistic
            # seq claim serializes rows, not the file writes a probe
            # races against. The costs: an orphan file set per CRASHED
            # forced attempt (invisible — no ledger row — exactly like
            # any crashed normal window's staging leftovers) and a
            # duplicate equal-content file per re-forced identical
            # window (the LWW fold's last-arrival tie resolves both to
            # the same state).
            import uuid as _uuid

            window_tag = (
                f"{window_tag}-f{self.ledger.max_seq()}-{_uuid.uuid4().hex[:8]}"
            )

        def prep(batch: pa.Table) -> pa.Table:
            # combiner: partition id + within-batch per-key pre-reduce, so
            # the exchange moves at most one row per (key, batch)
            batch = pad_and_cast(batch, target)
            part = hash_route_column(batch, key_cols, num_parts, splits)
            batch = batch.set_column(0, PART_COL, part)
            return resolve_keep_tombstones(batch, key_cols)

        handles = self._merger_pool(sorted(active_moduli(num_parts, splits)))
        pool = len(handles)
        prepped = ds.map_batches(prep, batch_format="pyarrow")

        # Explicit hash exchange (module docstring): stream prepped
        # blocks out of the Dataset as they materialize. On one node the
        # pool shares each block ref (plasma zero-copy; each merger
        # takes its rows — measured faster than an extra store round-
        # trip). On a multi-node cluster a zero-cpu locality-scheduled
        # task pre-splits each block per merger group and each actor
        # receives ONLY its slice, so network bytes = owned bytes (round
        # 1 shipped every block to every merger: window x pool bytes).
        # The in-flight ack cap backpressures the read either way.
        mode = self.exchange_mode
        if mode == "auto":
            alive = [n for n in ray.nodes() if n.get("Alive", False)]
            mode = "shared" if len(alive) <= 1 else "split"
        acks: list = []
        max_in_flight = 8 * pool
        try:
            for bundle in prepped.iter_internal_ref_bundles():
                for block_ref in bundle.block_refs:
                    if mode == "split":
                        slices = _split_block.options(num_returns=pool).remote(
                            block_ref, pool
                        )
                        if pool == 1:
                            slices = [slices]
                        acks.extend(
                            handles[g].ingest_block.remote(slices[g]) for g in range(pool)
                        )
                    else:
                        acks.extend(h.ingest_block.remote(block_ref) for h in handles)
                    if len(acks) >= max_in_flight:
                        _, pending = ray.wait(acks, num_returns=len(acks) - max_in_flight // 2)
                        acks = list(pending)
            ray.get(acks)  # every slice acknowledged by its owning merger
            stats_rows = [
                r
                for rows in ray.get([h.finish.remote(window_tag) for h in handles])
                for r in rows
            ]
        except BaseException:
            # A failed window (e.g. FileNotFoundError from a vacuumed
            # upstream read surfacing inside the streamed exchange) may
            # leave PARTIAL rows buffered in the merger actors; reusing
            # that pool would leak them into the next window's delta
            # files. Discard the pool — the next apply_window builds a
            # fresh one. No ledger row was committed, so lake state is
            # untouched and the caller may simply retry.
            for h in handles:
                try:
                    ray.kill(h)
                except Exception:
                    pass
            self._mergers = None
            raise

        entry = {
            "kind": "window",
            "lo": lo,
            "hi": hi,
            "schema_version": self.schema.version,
            "files": {str(r["part"]): r["file"] for r in stats_rows},
            "key_stats": {str(r["part"]): r["key_stats"] for r in stats_rows},
            "metrics": {
                "partitions": len(stats_rows),
                "rows_written": int(sum(r["rows"] for r in stats_rows)),
                "tombstones": int(sum(r["tombstones"] for r in stats_rows)),
                "bytes_written": int(sum(r["bytes"] for r in stats_rows)),
                "window_sec": round(_time.perf_counter() - _t0, 3),
                "events_per_sec": round(
                    (hi - lo) / max(1e-9, _time.perf_counter() - _t0)
                ),
                "per_partition": [
                    {k: r[k] for k in ("part", "rows", "tombstones", "bytes")}
                    for r in stats_rows
                ],
                **(extra_metrics or {}),
            },
        }
        self.ledger.append(entry)
        if getattr(self, "_metrics", None) is not None:
            from ..state.metrics import record_window

            record_window(self._metrics, entry)  # fire-and-forget pushes
        return entry

    def attach_metrics(self, metrics_handle) -> None:
        """A3/A4: push per-window counters/gauges to a metrics registry
        (state/metrics.get_metrics) after every ledger commit."""
        self._metrics = metrics_handle

    # -- read path ----------------------------------------------------------

    def live_files(
        self, as_of: int | None = None, entries: list[dict] | None = None
    ) -> dict[int, list[str]]:
        return {
            p: [os.path.join(self.dir, f) for f in fs]
            for p, fs in self.ledger.live_files(
                as_of_hi=as_of, entries=entries
            ).items()
            if fs
        }

    def max_row_seq(self) -> int:
        """Max ROW-level commit_seq across live files (tombstones
        included) from parquet FOOTER stats — no data scan. Distinct
        from the ledger watermark: window bounds are feed offsets, so a
        window may legally carry rows above its own ``hi``.
        Replication's heal path uses this to prove a foreign write did
        not plant seqs its watermark-stamped repair could never beat.
        Cost is one footer read per live file, driver-side — live-file
        count is bounded by compaction, and a heal is a rare manual
        event; not for hot paths."""
        hi = 0
        for files in self.live_files().values():
            for f in files:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.to_arrow_schema().get_field_index(SEQ_COL)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.max is not None:
                        hi = max(hi, st.max)
        return hi

    def read(
        self, columns: list[str] | None = None, as_of: int | None = None
    ) -> "ray.data.Dataset":
        """Resolved view of the table as a streaming Dataset — one task
        per partition, NO shuffle: a partition's base+delta files are
        co-located by construction, so per-partition resolution equals
        global resolution. Old files are null-padded / up-cast to the
        current reconciled schema by the parquet scanner (``schema=``).

        ``columns`` prunes at the read: only the requested payload
        columns plus the key/seq/op system columns leave storage.

        ``as_of``: TIME TRAVEL — the state as of the ledger commit whose
        window ``hi`` <= as_of (windows above it excluded via ledger
        replay, state/ledger.live_files). Valid until a later compaction
        vacuumed the requested history (raises then, with the missing
        files named); window files carry only their own (lo, hi] seqs,
        so no row-level seq filter is needed."""
        live = self.live_files(as_of=as_of)
        if as_of is not None:
            missing = [f for fs in live.values() for f in fs if not os.path.exists(f)]
            if missing:
                raise self._missing_files_error(f"time-travel as_of={as_of}", missing)
        target = self.full_arrow_schema()
        out_cols = [
            f.name for f in target if f.name not in (PART_COL, OP_COL)
        ]
        if columns:
            out_cols = [c for c in out_cols if c in columns or c in self.key_cols]
        phys_cols = sorted({OP_COL, SEQ_COL, *self.key_cols, *out_cols})
        if not live:
            empty = pa.schema([target.field(c) for c in out_cols]).empty_table()
            return ray.data.from_arrow(empty)
        key_cols = self.key_cols
        items = [{"part": p, "files": fs} for p, fs in sorted(live.items())]

        def load_partition(batch: pa.Table) -> pa.Table:
            tables = []
            for row in batch.to_pylist():
                t = pq.ParquetDataset(row["files"], schema=target).read(
                    columns=phys_cols
                )
                tables.append(resolve_arrow(t, key_cols).select(out_cols))
            return pa.concat_tables(tables)

        return ray.data.from_items(items).map_batches(
            load_partition, batch_size=1, batch_format="pyarrow"
        )

    def scan_range(
        self, col: str, lo, hi, columns: list[str] | None = None
    ) -> "ray.data.Dataset":
        """Zone-map-pruned resolved RANGE scan: rows of the CURRENT
        state with ``lo <= col <= hi`` (NULL never matches), reading the
        wide payload ONLY from files whose recorded [min, max] for
        ``col`` (a ``stats_cols`` entry or a key column) overlaps the
        range — the data-skipping scan a 100-TB lake runs for
        time/score-band queries over content-heavy tables.

        Merge-on-read makes naive file skipping UNSOUND: dropping an
        excluded file could drop the newest version of a key and
        resurrect an older in-range row. The sound two-phase shape used
        here: excluded files still contribute their (key, seq, op)
        columns — a narrow columnar read that skips the payload bytes —
        padded with NULL payload, so LWW resolution sees every version.
        A winner padded from an excluded file then fails the residual
        range filter, which is CORRECT: its true value is provably
        outside the range (that is what its zone bounds excluded).
        Files with no recorded bounds for ``col`` are read in full
        (never pruned). ``self.last_scan_stats`` records files_full /
        files_narrow for observability and tests."""
        ents = self.ledger.entries()
        live = self.live_files(entries=ents)
        stats = self._file_key_stats(entries=ents)
        target = self.full_arrow_schema()
        out_cols = [f.name for f in target if f.name not in (PART_COL, OP_COL)]
        if columns:
            out_cols = [c for c in out_cols if c in columns or c in self.key_cols]
        phys_cols = sorted({OP_COL, SEQ_COL, col, *self.key_cols, *out_cols})
        narrow_cols = sorted({OP_COL, SEQ_COL, *self.key_cols})
        key_cols = self.key_cols

        def overlaps(f_abs: str) -> bool:
            rel = os.path.relpath(f_abs, self.dir)
            mn, mx = stats.get(rel, {}).get(col, [None, None])
            if mn is None:
                return True  # no bounds recorded -> never prunable
            return not (mx < lo or mn > hi)

        items = []
        n_full = n_narrow = 0
        for p, fs in sorted(live.items()):
            full, narrow = [], []
            for f in fs:
                (full if overlaps(f) else narrow).append(f)
            if not full:
                continue  # no in-range version can exist in this partition
            n_full += len(full)
            n_narrow += len(narrow)
            items.append({"part": p, "full": full, "narrow": narrow})
        self.last_scan_stats = {
            "files_total": sum(len(fs) for fs in live.values()),
            "files_full": n_full,
            "files_narrow": n_narrow,
        }
        out_schema = pa.schema(
            [target.field(c) for c in out_cols]
        )
        if not items:
            return ray.data.from_arrow(out_schema.empty_table())

        def load_partition(batch: pa.Table) -> pa.Table:
            tables = []
            for row in batch.to_pylist():
                parts = [
                    pq.ParquetDataset(row["full"], schema=target)
                    .read(columns=phys_cols)
                    .select(phys_cols)
                ]
                if row["narrow"]:
                    nt = pq.ParquetDataset(row["narrow"], schema=target).read(
                        columns=narrow_cols
                    )
                    parts.append(
                        pa.table(
                            {
                                c: nt[c]
                                if c in nt.column_names
                                else pa.nulls(nt.num_rows, target.field(c).type)
                                for c in phys_cols
                            }
                        )
                    )
                t = resolve_arrow(pa.concat_tables(parts), key_cols)
                keep = pc.and_kleene(
                    pc.greater_equal(t[col], lo), pc.less_equal(t[col], hi)
                )
                tables.append(
                    t.filter(pc.fill_null(keep, False)).select(out_cols)
                )
            return pa.concat_tables(tables)

        return ray.data.from_items(items).map_batches(
            load_partition, batch_size=1, batch_format="pyarrow"
        )

    def _file_key_stats(self, entries: list[dict] | None = None) -> dict[str, dict]:
        """{relative file path: per-key-col zone map} from one ledger
        scan. Files committed before zone maps existed simply have no
        entry (never pruned)."""
        stats: dict[str, dict] = {}
        for e in self.ledger.entries() if entries is None else entries:
            if e["kind"] == "window":
                ks = e.get("key_stats", {})
                for p, f in e["files"].items():
                    if p in ks:
                        stats[f] = ks[p]
            elif e["kind"] == "compact":
                for info in e["parts"].values():
                    for one in info if isinstance(info, list) else [info]:
                        if one.get("file") and one.get("key_stats"):
                            stats[one["file"]] = one["key_stats"]
            elif e["kind"] == "split":
                for infos in e["parts"].values():
                    for one in infos:
                        if one.get("file") and one.get("key_stats"):
                            stats[one["file"]] = one["key_stats"]
        return stats

    def _missing_files_error(self, tag: str, missing: list[str]) -> FileNotFoundError:
        """Build the precise time-travel error: name the ledger VACUUM
        row (if any) that removed the needed files, else attribute the
        loss to an immediate-mode compaction (pre-retention behavior)."""
        rels = {os.path.relpath(f, self.dir) for f in missing}
        culprit = None
        for e in self.ledger.iter_entries_desc():
            if e["kind"] == "vacuum" and rels & set(e.get("removed", [])):
                culprit = e
                break
        if culprit is not None:
            return FileNotFoundError(
                f"{tag} history was removed by vacuum ledger row "
                f"{culprit['_seq']} (through_seq={culprit.get('through_seq')}, "
                f"keep_history={culprit.get('keep_history')}); "
                f"missing: {sorted(rels)[:3]}"
            )
        return FileNotFoundError(
            f"{tag} history was vacuumed by a later compaction "
            f"(immediate GC mode); missing: {sorted(rels)[:3]}"
        )

    def lookup(
        self,
        keys,
        columns: list[str] | None = None,
        as_of: int | None = None,
    ) -> pa.Table:
        """Resolved rows for an explicit key set, with TWO-LEVEL file
        pruning — the point-lookup path a 100-TB lake needs (a full
        ``read()`` would stream every partition for a handful of keys):

        1. PARTITION pruning: each key hashes to exactly one partition
           (hash_mod_column is the same function the write path uses),
           so only |keys| of num_partitions partitions are touched.
        2. FILE pruning, two independent proofs of absence: the
           ledger-recorded per-key-column [min, max] zone map (wins on
           range-correlated keys: sequence ids, timestamps), then the
           per-file Bloom sidecar over the composite-key hash (wins on
           hash-like string keys, where every file spans the whole
           alphabet and min/max never excludes). Sound either way: a
           skipped file provably holds no version of the key, and LWW
           resolution only needs the key's own rows — all of which
           live in its one partition.

        ``keys``: list[dict] or pa.Table holding exactly the key
        columns. Returns a pa.Table (point lookups are small by
        contract; use ``read()`` for scans). Tombstoned keys return no
        row. ``self.last_lookup_stats`` records files_total /
        files_read / partitions_read for observability and tests."""
        import polars as pl

        if isinstance(keys, list):
            keys = pa.Table.from_pylist(keys)
        target = self.full_arrow_schema()
        out_cols = [f.name for f in target if f.name not in (PART_COL, OP_COL)]
        if columns:
            out_cols = [c for c in out_cols if c in columns or c in self.key_cols]
        if keys.num_rows == 0:
            self.last_lookup_stats = {
                "keys": 0, "files_total": 0, "files_read": 0,
                "files_zone_skipped": 0, "files_bloom_skipped": 0,
                "partitions_total": 0, "partitions_read": 0,
            }
            return pa.schema([target.field(c) for c in out_cols]).empty_table()
        keys = pa.table(
            {c: pc.cast(keys[c], target.field(c).type) for c in self.key_cols}
        )
        ents = self.ledger.entries()  # ONE ledger scan feeds all three views
        parts = hash_route_column(
            keys, self.key_cols, self.num_partitions,
            self.ledger.splits(entries=ents, as_of_hi=as_of),
        )
        parts_np = parts.to_numpy(zero_copy_only=False)
        live = self.live_files(as_of=as_of, entries=ents)
        if as_of is not None:
            missing = [f for fs in live.values() for f in fs if not os.path.exists(f)]
            if missing:
                raise self._missing_files_error(f"time-travel as_of={as_of}", missing)
        stats = self._file_key_stats(entries=ents)
        phys_cols = sorted({OP_COL, SEQ_COL, *self.key_cols, *out_cols})
        key_cols = self.key_cols

        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(parts_np):
            by_part.setdefault(int(p), []).append(i)
        files_read = partitions_read = 0
        tasks = []
        zone_skipped = bloom_skipped = 0
        for p, idx in sorted(by_part.items()):
            fs = live.get(p)
            if not fs:
                continue
            ktab = keys.take(idx)
            kh = hash64_column(ktab, key_cols).to_numpy(zero_copy_only=False)
            kept = []
            for f in fs:
                if not _zone_may_contain(
                    stats.get(os.path.relpath(f, self.dir), {}), ktab
                ):
                    zone_skipped += 1
                elif not _bloom_may_contain(f, kh):
                    bloom_skipped += 1
                else:
                    kept.append(f)
            if not kept:
                continue
            partitions_read += 1
            files_read += len(kept)
            tasks.append(
                _lookup_partition.remote(
                    kept, ktab, target, phys_cols, key_cols, out_cols
                )
            )
        self.last_lookup_stats = {
            "keys": keys.num_rows,
            "files_total": sum(len(fs) for fs in live.values()),
            "files_read": files_read,
            "files_zone_skipped": zone_skipped,
            "files_bloom_skipped": bloom_skipped,
            "partitions_total": len(live),
            "partitions_read": partitions_read,
        }
        empty = pa.schema([target.field(c) for c in out_cols]).empty_table()
        got = [t for t in ray.get(tasks) if t.num_rows]
        return pa.concat_tables([empty, *got]) if got else empty

    def diff_as_of(
        self,
        seq_a: int,
        seq_b: int,
        columns: list[str] | None = None,
        include_old: bool = False,
    ) -> "ray.data.Dataset":
        """CDC diff: the changelog between two committed states — every
        key whose VISIBLE VALUE differs between ``as_of=seq_a`` and
        ``as_of=seq_b``, classified in a ``change`` column as ``insert``
        (key only in b), ``delete`` (key only in a; the row carries its
        last-known a-side values), or ``update`` (present in both with
        any payload column differing, null-safe). Value-level semantics:
        a re-upsert that leaves every payload value identical is NOT a
        change (compare ``read(as_of=...)`` twice if you want seq-level
        provenance).

        ``include_old=True`` switches to the both-sides contract that
        incremental view maintenance needs: payload columns carry the
        NEW (b-side) values (null for delete) and each gains a
        ``<col>__old`` sibling with the OLD (a-side) value (null for
        insert) — so a consumer can retract the old contribution and
        add the new one without a second state read.

        Scale shape: like :meth:`read`, one task per partition and NO
        shuffle — a partition's files at both cutoffs are co-located by
        construction, so each task resolves both states locally and
        diffs them with one vectorized polars full join. Cost is
        O(|state_a| + |state_b|), never a cross-partition exchange.
        Subject to the same vacuumed-history rule as time travel.
        """
        if seq_a > seq_b:
            raise ValueError(f"diff needs seq_a <= seq_b, got {seq_a} > {seq_b}")
        import polars as pl

        live_a = self.live_files(as_of=seq_a)
        live_b = self.live_files(as_of=seq_b)
        for tag, live in (("seq_a", live_a), ("seq_b", live_b)):
            missing = [
                f for fs in live.values() for f in fs if not os.path.exists(f)
            ]
            if missing:
                raise self._missing_files_error(f"diff at {tag}", missing)
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        out_cols = [
            f.name
            for f in target
            if f.name not in (PART_COL, OP_COL, SEQ_COL)
        ]
        if columns:
            out_cols = [c for c in out_cols if c in columns or c in key_cols]
        payload = [c for c in out_cols if c not in key_cols]
        # output/suffix name collisions would silently shadow user data
        # (a payload literally named "change") or mis-pair the changed
        # detection (payload x alongside x__b): reject them up front
        reserved = {"change", "__a", "__b"}
        names = set(out_cols)
        clashes = [c for c in out_cols if c in reserved] + [
            c
            for c in payload
            if f"{c}__b" in names or (include_old and f"{c}__old" in names)
        ]
        if clashes:
            raise ValueError(
                f"diff_as_of cannot operate on columns named {sorted(set(clashes))}: "
                f"'change'/'__a'/'__b' are output/flag names and '<col>__b'/"
                f"'<col>__old' are join-suffix names — rename or prune via "
                f"columns=[...]"
            )
        phys_cols = sorted({OP_COL, SEQ_COL, *out_cols})
        old_fields = (
            [pa.field(f"{c}__old", target.field(c).type) for c in payload]
            if include_old
            else []
        )
        out_schema = pa.schema(
            [target.field(c) for c in out_cols]
            + old_fields
            + [pa.field("change", pa.string())]
        )
        ents = self.ledger.entries()
        splits_a = self.ledger.splits(entries=ents, as_of_hi=seq_a)
        splits_b = self.ledger.splits(entries=ents, as_of_hi=seq_b)
        base = self.num_partitions
        if splits_a == splits_b:
            parts = sorted(set(live_a) | set(live_b))
            items = [
                {
                    "files_a": live_a.get(p, []),
                    "route_a": False,
                    "children": [{"part": p, "files_b": live_b.get(p, [])}],
                }
                for p in parts
            ]
        else:
            # a PARTITION SPLIT lies between the cutoffs: pairing by raw
            # partition id would compare a parent's a-state against an
            # (empty or partial) child b-state and emit a spurious
            # delete+insert pair for every key whose partition moved —
            # at equal seqs, a nondeterministic LWW coin flip for a
            # downstream replica. Instead each b-active partition c is
            # diffed against ITS SLICE of the a-state: splits only
            # refine (splits_a is a prefix of splits_b), so c's hash
            # class lives in exactly one a-active partition; the task
            # re-routes the resolved a-rows under b's topology and keeps
            # only c's — a key that merely moved partitions then joins
            # its unchanged value and emits nothing.
            a_act = active_moduli(base, splits_a)
            b_act = active_moduli(base, splits_b)

            def a_part_of(c: int) -> int | None:
                for ia, ma in a_act.items():
                    if c % ma == ia:
                        return ia
                return None

            # ONE item (= one read + one LWW resolve of the parent's
            # a-state) per a-parent, diffing all of its b-children from
            # the same resolved table — a maintain() split at factor 16
            # would otherwise re-read and re-resolve the parent 16x
            by_parent: dict[int | None, list[dict]] = {}
            for c in sorted(set(b_act) | set(live_b)):
                fb = live_b.get(c, [])
                pa_id = a_part_of(c)
                if live_a.get(pa_id) or fb:
                    by_parent.setdefault(pa_id, []).append(
                        {"part": c, "files_b": fb}
                    )
            items = [
                {
                    "files_a": live_a.get(pa_id, []),
                    "route_a": True,
                    "children": children,
                }
                for pa_id, children in sorted(
                    by_parent.items(), key=lambda kv: (kv[0] is None, kv[0])
                )
            ]
        if not items:
            return ray.data.from_arrow(out_schema.empty_table())
        state_schema = pa.schema([target.field(c) for c in out_cols])

        def diff_partition(batch: pa.Table) -> pa.Table:
            from ..util import hash_route_column as _route

            outs = []
            for row in batch.to_pylist():

                def load(files) -> pa.Table:
                    t = pq.ParquetDataset(files, schema=target).read(
                        columns=phys_cols
                    )
                    return resolve_arrow(t, key_cols)

                # the parent's a-state is read and LWW-resolved ONCE,
                # then sliced per child by b-topology routing
                ra = load(row["files_a"]) if row["files_a"] else None
                ids = (
                    _route(ra, key_cols, base, splits_b)
                    if ra is not None and row["route_a"]
                    else None
                )
                for child in row["children"]:
                    if ra is None:
                        da = pl.from_arrow(state_schema.empty_table())
                    elif ids is not None:
                        da = pl.from_arrow(
                            ra.filter(pc.equal(ids, child["part"])).select(out_cols)
                        )
                    else:
                        da = pl.from_arrow(ra.select(out_cols))
                    db = (
                        pl.from_arrow(load(child["files_b"]).select(out_cols))
                        if child["files_b"]
                        else pl.from_arrow(state_schema.empty_table())
                    )
                    da = da.with_columns(pl.lit(True).alias("__a"))
                    db = db.with_columns(pl.lit(True).alias("__b"))
                    # nulls_equal: a null-keyed row present unchanged in
                    # both states must JOIN (and emit nothing), not split
                    # into a same-seq delete+insert pair whose LWW tie a
                    # downstream replication apply resolves
                    # nondeterministically
                    j = da.join(
                        db,
                        on=key_cols,
                        how="full",
                        suffix="__b",
                        coalesce=True,
                        nulls_equal=True,
                    )
                    in_a = pl.col("__a").fill_null(False)
                    in_b = pl.col("__b").fill_null(False)
                    changed = (
                        pl.any_horizontal(
                            [pl.col(c).ne_missing(pl.col(f"{c}__b")) for c in payload]
                        )
                        if payload
                        else pl.lit(False)
                    )
                    j = j.with_columns(
                        pl.when(~in_a)
                        .then(pl.lit("insert"))
                        .when(~in_b)
                        .then(pl.lit("delete"))
                        .when(changed)
                        .then(pl.lit("update"))
                        .otherwise(pl.lit(None, pl.String))
                        .alias("change")
                    ).filter(pl.col("change").is_not_null())
                    if include_old:
                        # new values plain (a-side nulls for delete come
                        # from the join), old values as <c>__old siblings
                        vals = [pl.col(f"{c}__b").alias(c) for c in payload] + [
                            pl.col(c).alias(f"{c}__old") for c in payload
                        ]
                    else:
                        vals = [
                            pl.when(pl.col("change") == "delete")
                            .then(pl.col(c))
                            .otherwise(pl.col(f"{c}__b"))
                            .alias(c)
                            for c in payload
                        ]
                    outs.append(
                        j.select([*key_cols, *vals, "change"])
                        .to_arrow()
                        .cast(out_schema)
                    )
            return (
                pa.concat_tables(outs) if outs else out_schema.empty_table()
            )

        return ray.data.from_items(items).map_batches(
            diff_partition, batch_size=1, batch_format="pyarrow"
        )

    # -- maintenance --------------------------------------------------------

    def compact(
        self,
        min_files: int = 2,
        tombstone_watermark: int = 0,
        max_input_bytes: int | None = None,
        vacuum: str = "immediate",
        cluster_by: list[str] | None = None,
    ) -> dict:
        """Fold each partition's base+deltas into fewer base files.

        ``tombstone_watermark``: tombstone winners with commit_seq <= the
        watermark are physically dropped. Only pass a nonzero watermark
        when no future window can deliver an event with a lower seq (the
        seq-range replayer guarantees this; arrival-ordered ingest with
        cross-window disorder must keep tombstones, else a late lower-seq
        update would wrongly resurrect a deleted key).

        ``max_input_bytes``: SIZE-TIERED mode — the 100-TB scale fix for
        whole-partition single-task folds (a partition's accumulated
        state eventually outgrows one worker's heap). Each fold task
        reads at most this many input bytes: a partition's live files
        are grouped into CONSECUTIVE runs (ledger order) under the
        budget; each run of >= 2 files folds into one base, single-file
        runs pass through untouched. Repeated tiered compactions
        converge geometrically (N small deltas -> N/k tier bases -> ...)
        while every task stays byte-bounded. Correctness under partial
        folds relies on two invariants: (a) the ledger replay INSERTS a
        fold's output at its first replaced file's position, so
        equal-seq LWW tie order is preserved; (b) the tombstone
        watermark is only applied when a single fold covers ALL of a
        partition's live files — a later-committed file may legally
        carry a LOWER seq (forced recovery windows), and dropping a
        tombstone from a prefix fold could let such a row resurrect.

        ``vacuum``: "immediate" (default) unlinks replaced files right
        after the commit — time-travel history before this compaction
        is gone (the pre-round-5 behavior). "defer" leaves them on disk
        for :meth:`vacuum` to GC later under its grace window, keeping
        older ``as_of`` reads valid until an explicit retention pass.

        ``cluster_by``: CLUSTERED rewrite (the lakehouse OPTIMIZE/
        Z-ORDER idea, lexicographic): each fold's output is sorted by
        these columns and cut into range-disjoint chunk files (sized by
        ``max_input_bytes``, default 64 MB), so every file's ledger
        zone map covers a narrow band of the clustering columns and
        ``scan_range`` over them prunes most files — without it a
        random-ordered base spans the whole domain and nothing ever
        prunes. Use the partition's dominant range-scan column(s)
        (``stats_cols`` entries, typically a time or score band). Safe
        at any point: a fold holds one resolved row per key, so
        intra-fold row order never decides an LWW tie; only the first
        chunk carries the fold's ``replaces`` (the rest append — their
        key sets are disjoint).

        Raw Ray tasks (not Dataset) by design: this is per-partition file
        maintenance with no cross-partition dataflow — each task reads
        only its own partition's files. One ledger row commits all
        folds atomically; a crash mid-compaction leaves only orphaned
        tmp files.
        """
        if vacuum not in ("immediate", "defer"):
            raise ValueError(f"vacuum must be 'immediate' or 'defer', got {vacuum!r}")
        if cluster_by:
            zone = set(self.key_cols) | set(self.stats_cols)
            bad = [c for c in cluster_by if c not in zone]
            if bad:
                # fail fast: zone maps are only recorded for key/stats
                # columns, so clustering on anything else pays the sort
                # + extra files and prunes NOTHING, silently
                raise ValueError(
                    f"cluster_by columns {bad} are not zone-map columns; "
                    f"usable: key_cols {self.key_cols} + stats_cols "
                    f"{self.stats_cols} (declare stats_cols at create)"
                )
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        zone_cols = self.key_cols + self.stats_cols
        lake_dir = self.dir
        gen = self.ledger.next_seq()

        @ray.remote
        def compact_fold(
            part: int, files: list[str], tier: int, tag: str, drop_tombs: bool
        ) -> tuple[int, int, list[dict]]:
            tbl = pq.ParquetDataset(files, schema=target).read()
            merged = resolve_keep_tombstones(tbl, key_cols)
            if drop_tombs and tombstone_watermark > 0:
                drop = pc.and_(
                    pc.equal(merged[OP_COL], TOMBSTONE),
                    pc.less_equal(merged[SEQ_COL], tombstone_watermark),
                )
                merged = merged.filter(pc.invert(drop))
            part_dir = os.path.join(lake_dir, f"part={part:05d}")
            chunks = [merged]
            if cluster_by and merged.num_rows:
                # CLUSTERED rewrite: sort the fold by the clustering
                # columns, then cut it into range-disjoint chunk files
                # so each file's ledger zone map covers a NARROW band —
                # scan_range then prunes most files instead of none
                # (lexicographic Z-ordering; safe because the fold holds
                # one resolved row per key, so intra-fold row order
                # never decides an LWW tie)
                merged = merged.sort_by([(c, "ascending") for c in cluster_by])
                budget = max_input_bytes or (64 << 20)
                n_chunks = max(1, -(-merged.nbytes // budget))
                rows_per = -(-merged.num_rows // n_chunks)
                chunks = [
                    merged.slice(i, rows_per)
                    for i in range(0, merged.num_rows, rows_per)
                ]
            infos = []
            for j, chunk in enumerate(chunks):
                rel = (
                    f"part={part:05d}/base-{tag}.parquet"
                    if len(chunks) == 1
                    else f"part={part:05d}/base-{tag}-c{j:03d}.parquet"
                )
                fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
                os.close(fd)
                chunk = chunk.combine_chunks()
                pq.write_table(chunk, tmp)
                os.replace(tmp, os.path.join(lake_dir, rel))
                _write_key_bloom(chunk, key_cols, os.path.join(lake_dir, rel))
                info = {
                    "file": rel,
                    # only the first chunk replaces the inputs; later
                    # chunks ANCHOR to their predecessor (insert_after)
                    # so the whole chunk run sits at the fold's replay
                    # position — a bare append would leapfrog newer
                    # tiers/concurrent deltas and flip equal-seq LWW
                    # ties back to pre-repair values
                    "replaces": [
                        os.path.relpath(f, lake_dir) for f in files
                    ]
                    if j == 0
                    else [],
                    "rows": chunk.num_rows,
                    "bytes": os.path.getsize(os.path.join(lake_dir, rel)),
                    "key_stats": _key_zone_stats(chunk, zone_cols),
                }
                if j > 0:
                    info["insert_after"] = infos[-1]["file"]
                infos.append(info)
            return part, tier, infos

        todo = {p: fs for p, fs in self.live_files().items() if len(fs) >= min_files}
        if not todo:
            return {"kind": "compact", "parts": {}}
        tasks = []
        for p, fs in sorted(todo.items()):
            groups = (
                [fs]
                if max_input_bytes is None
                else _byte_bounded_groups(fs, max_input_bytes)
            )
            full_fold = len(groups) == 1 and len(groups[0]) == len(fs)
            for t, grp in enumerate(groups):
                if len(grp) < 2 and not full_fold:
                    continue  # a lone (possibly huge) tier passes through;
                    # a FULL single-file fold still runs (min_files=1 +
                    # tombstone_watermark relies on it)
                tag = f"{gen:08d}" if full_fold else f"{gen:08d}-{t:03d}"
                tasks.append(
                    compact_fold.remote(p, grp, t, tag, full_fold)
                )
        if not tasks:
            return {"kind": "compact", "parts": {}}
        results = ray.get(tasks)
        by_part: dict[int, list[tuple[int, list[dict]]]] = {}
        for p, t, infos in results:
            by_part.setdefault(p, []).append((t, infos))
        parts_entry: dict[str, object] = {}
        for p, folds in sorted(by_part.items()):
            flat = [info for _, infos in sorted(folds) for info in infos]
            # single-fold partitions keep the legacy single-dict shape
            parts_entry[str(p)] = flat[0] if len(flat) == 1 else flat
        entry = {"kind": "compact", "parts": parts_entry}
        self.ledger.append(entry)
        if vacuum == "immediate":
            for _, _, infos in results:  # best-effort; ledger already excludes
                for info in infos:
                    for f in info["replaces"]:
                        for path in (f, f + ".bloom.npz"):
                            try:
                                os.unlink(os.path.join(self.dir, path))
                            except OSError:
                                pass
        # fold the ledger so the next apply/read replays O(rows since
        # here), not O(all windows) — long-running streaming lakes
        # otherwise reopen thousands of window JSONs per window
        # (best-effort: a lost multi-writer claim just tries next time)
        self.ledger.checkpoint()
        return entry

    def split_partition(
        self,
        part: int,
        factor: int = 2,
        max_input_bytes: int | None = None,
    ) -> dict:
        """LEDGER-RECORDED partition split: rewrite one active
        partition's live files into ``factor`` children so a lake
        created at N partitions survives 100x growth — the second half
        of the scale fix (tiered compaction bounds a fold's memory;
        splitting bounds a PARTITION's total state).

        Child routing refines the parent's hash class: the parent owns
        keys with ``h % modulus == part``; children own
        ``h % (modulus * factor)`` in ``{part + j * modulus}`` — a pure
        refinement, so every existing key stays derivable from the same
        64-bit hash and per-partition resolution stays equal to global
        resolution. The split row commits atomically in the ledger;
        ``apply_window`` re-reads the topology each window and rebuilds
        its merger pool, ``lookup`` routes through the same refinement,
        and reads just see the children's files.

        Mechanics: the parent's live files are processed in LEDGER
        ORDER in byte-bounded groups (``max_input_bytes``, default one
        group per file — each task reads one file), each routed row
        lands in its child's output for that group, and per-child file
        order preserves the parent's file order — so equal-seq LWW tie
        resolution is unchanged. No cross-file fold happens (splitting
        is routing, not compaction), so memory per task is bounded by
        the group byte budget regardless of partition size.

        Parent files are NOT deleted (a split always defers GC):
        time travel to pre-split state keeps working until an explicit
        :meth:`vacuum`. Splits are maintenance ops — do not run one
        concurrently with apply_window (same exclusivity contract as
        the reference's DDL lock, server/storages/table_helper.go).
        """
        if factor < 2:
            raise ValueError("factor must be >= 2")
        splits = self.ledger.splits()
        act = active_moduli(self.num_partitions, splits)
        if part not in act:
            raise ValueError(
                f"partition {part} is not an active partition "
                f"(active: {sorted(act)[:8]}{'...' if len(act) > 8 else ''})"
            )
        modulus = act[part]
        new_mod = modulus * factor
        children = [part + j * modulus for j in range(factor)]
        live = self.live_files().get(part, [])
        target = self.full_arrow_schema()
        key_cols = self.key_cols
        zone_cols = self.key_cols + self.stats_cols
        lake_dir = self.dir
        gen = self.ledger.next_seq()

        groups = (
            [[f] for f in live]  # default: one routing task per file
            if max_input_bytes is None
            else _byte_bounded_groups(live, max_input_bytes)
        )

        @ray.remote
        def split_group(gi: int, files: list[str]) -> list[tuple[int, int, dict]]:
            import numpy as np

            tbl = pq.ParquetDataset(files, schema=target).read()
            if tbl.num_rows == 0:
                return []
            ids = (
                hash_mod_column(tbl, key_cols, new_mod)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            out = []
            for child in children:
                idx = np.nonzero(ids == child)[0]
                if idx.size == 0:
                    continue
                sub = tbl.take(idx)  # take preserves input row order
                sub = sub.set_column(
                    0, PART_COL, pa.array(np.full(idx.size, child, np.int32))
                )
                part_dir = os.path.join(lake_dir, f"part={child:05d}")
                os.makedirs(part_dir, exist_ok=True)
                rel = f"part={child:05d}/split-{gen:08d}-{gi:04d}.parquet"
                fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
                os.close(fd)
                pq.write_table(sub, tmp)
                os.replace(tmp, os.path.join(lake_dir, rel))
                _write_key_bloom(sub, key_cols, os.path.join(lake_dir, rel))
                out.append(
                    (
                        child,
                        gi,
                        {
                            "file": rel,
                            "rows": sub.num_rows,
                            "bytes": os.path.getsize(os.path.join(lake_dir, rel)),
                            "key_stats": _key_zone_stats(sub, zone_cols),
                        },
                    )
                )
            return out

        results = [
            r
            for rs in ray.get(
                [split_group.remote(gi, grp) for gi, grp in enumerate(groups)]
            )
            for r in rs
        ]
        by_child: dict[int, list[tuple[int, dict]]] = {c: [] for c in children}
        for child, gi, info in results:
            by_child[child].append((gi, info))
        entry = {
            "kind": "split",
            "parent": part,
            "modulus": modulus,
            "factor": factor,
            "children": children,
            "replaces": [os.path.relpath(f, self.dir) for f in live],
            # per-child infos in GROUP order = parent file order: the
            # replay appends them in this order, preserving LWW ties
            "parts": {
                str(c): [info for _, info in sorted(folds)]
                for c, folds in by_child.items()
                if folds
            },
        }
        self.ledger.append(entry)
        self.ledger.checkpoint()
        return entry

    def maintain(
        self,
        max_partition_bytes: int | None = None,
        max_input_bytes: int | None = None,
        min_files: int = 4,
        tombstone_watermark: int = 0,
        keep_history: int | None = None,
        max_split_factor: int = 16,
        cluster_by: list[str] | None = None,
    ) -> dict:
        """ONE policy-driven maintenance pass — the operational loop a
        long-running lake schedules instead of hand-picking mechanisms:

        1. SPLIT every active partition whose live bytes exceed
           ``max_partition_bytes`` (factor = ceil(bytes / budget),
           clamped to ``max_split_factor``, so each child lands near or
           under the budget in one pass).
        2. Size-tiered COMPACT partitions holding >= ``min_files`` live
           files under ``max_input_bytes`` (defaults to the partition
           budget), with GC DEFERRED.
        3. VACUUM with ``keep_history`` (skipped when None — retention
           stays an explicit policy choice).

        Splits before compaction: folding an oversized partition first
        would burn a byte-bounded fold pass on files the split is about
        to rewrite anyway. Returns {"splits", "compact", "vacuum"}.
        Same exclusivity contract as split_partition (no concurrent
        window applier)."""
        splits_done = []
        if max_partition_bytes is not None:
            sizes = {
                p: sum(os.path.getsize(f) for f in fs)
                for p, fs in self.live_files().items()
            }
            act = active_moduli(self.num_partitions, self.ledger.splits())
            for p, nbytes in sorted(sizes.items()):
                if p in act and nbytes > max_partition_bytes:
                    factor = min(
                        max_split_factor,
                        max(2, -(-nbytes // max_partition_bytes)),
                    )
                    splits_done.append(
                        self.split_partition(
                            p,
                            factor=factor,
                            max_input_bytes=max_input_bytes or max_partition_bytes,
                        )
                    )
        compact_entry = self.compact(
            min_files=min_files,
            tombstone_watermark=tombstone_watermark,
            max_input_bytes=max_input_bytes or max_partition_bytes,
            vacuum="defer",
            cluster_by=cluster_by,
        )
        vac = self.vacuum(keep_history) if keep_history is not None else None
        return {"splits": splits_done, "compact": compact_entry, "vacuum": vac}

    def vacuum(self, keep_history: int = 0) -> dict:
        """Retention pass: physically delete files that no CURRENT view
        references and whose replacing compaction/split committed at or
        before ``max_seq - keep_history`` ledger rows ago — file GC
        decoupled from compaction (use ``compact(vacuum="defer")``), the
        archive step of the reference's uploader
        (server/logfiles/uploader.go:138-145) done as policy.

        ``keep_history=N`` is the GRACE WINDOW in ledger rows: any
        ``as_of`` whose bounded replay only needs files replaced within
        the last N rows keeps working; older time travel raises
        FileNotFoundError naming the vacuum row that removed its files
        (the ledger row makes the error precise and auditable). The
        vacuum row commits BEFORE any unlink, so a crash mid-delete
        leaves recorded-but-present files that the next vacuum sweeps.
        Returns the committed entry plus {"removed": n} counts."""
        ents = self.ledger.entries()
        cutoff = max((e["_seq"] for e in ents), default=0) - keep_history
        live = {
            f for fs in self.ledger.live_files(entries=ents).values() for f in fs
        }
        already: set[str] = set()
        dead: list[str] = []
        for e in ents:
            if e["kind"] == "vacuum":
                already.update(e.get("removed", []))
            elif e["_seq"] > cutoff:
                continue
            elif e["kind"] == "compact":
                for info in e["parts"].values():
                    for one in info if isinstance(info, list) else [info]:
                        dead.extend(one["replaces"])
            elif e["kind"] == "split":
                dead.extend(e["replaces"])
        remove = [f for f in dict.fromkeys(dead) if f not in live and f not in already]
        entry = {
            "kind": "vacuum",
            "removed": remove,
            "through_seq": cutoff,
            "keep_history": keep_history,
        }
        if remove:
            self.ledger.append(entry)
        removed_now = 0
        # sweep this pass's files, plus earlier-recorded stragglers that
        # STILL EXIST (a crash between a vacuum row and its unlinks).
        # The exists() filter matters on long-running lakes: `already`
        # is the union of every historical vacuum row, and issuing two
        # failing unlinks per long-gone file per maintenance pass would
        # grow per-pass cost with lake age instead of with actual work.
        stragglers = [
            f
            for f in already
            # either path counts: a crash between the parquet unlink and
            # the sidecar unlink must not orphan the .bloom.npz forever
            if os.path.exists(os.path.join(self.dir, f))
            or os.path.exists(os.path.join(self.dir, f + ".bloom.npz"))
        ]
        for f in [*remove, *stragglers]:
            for path in (f, f + ".bloom.npz"):
                try:
                    os.unlink(os.path.join(self.dir, path))
                    removed_now += path == f
                except OSError:
                    pass
        entry["removed_now"] = removed_now
        return entry

    def last_committed_hi(self) -> int:
        return self.ledger.last_committed_hi()

    def delete_where(self, predicate, commit_seq: int | None = None) -> dict:
        """Interval refresh-replace, delete half (SURVEY §2.7 D2 — the
        reference's ``DELETE WHERE eventn_ctx_time_interval = X`` before a
        re-sync, adapters/delete_condition.go:24-33): emit tombstones for
        every live key matching ``predicate`` (a ``pa.Table -> bool mask``
        over the resolved table) as one maintenance window. A follow-up
        insert window completes the refresh; LWW keeps it idempotent.

        ``commit_seq`` must exceed every applied event's seq (defaults to
        last_committed_hi + 1 — correct when the caller owns the global
        sequencer).
        """
        hi0 = self.ledger.last_committed_hi()
        seq = commit_seq if commit_seq is not None else hi0 + 1
        if seq <= hi0:
            raise ValueError(f"tombstone seq {seq} must exceed committed hi {hi0}")
        key_cols = self.key_cols

        def to_tombstones(batch: pa.Table) -> pa.Table:
            mask = predicate(batch)
            keys = batch.filter(mask).select(key_cols)
            n = keys.num_rows
            cols = {
                OP_COL: pa.array([TOMBSTONE] * n, pa.string()),
                SEQ_COL: pa.array([seq] * n, pa.int64()),
            }
            for k in key_cols:
                cols[k] = keys[k]
            return pa.table(cols)

        ds = self.read().map_batches(to_tombstones, batch_format="pyarrow")
        return self.apply_window(ds, seq - 1, seq)

    def ingest_report(self) -> dict:
        """T7/A3 analog: fold the ledger's per-window lineage into run
        totals (success counters; per-partition detail preserved)."""
        windows = self.ledger.window_metrics()
        per_part: dict[int, dict] = {}
        for w in windows:
            for pp in w.get("metrics", {}).get("per_partition", []):
                d = per_part.setdefault(
                    int(pp["part"]), {"rows": 0, "tombstones": 0, "bytes": 0, "windows": 0}
                )
                d["rows"] += pp["rows"]
                d["tombstones"] += pp["tombstones"]
                d["bytes"] += pp["bytes"]
                d["windows"] += 1
        return {
            "windows": len(windows),
            "last_committed_hi": self.ledger.last_committed_hi(),
            "rows_written": sum(w["metrics"]["rows_written"] for w in windows if "metrics" in w),
            "tombstones": sum(w["metrics"]["tombstones"] for w in windows if "metrics" in w),
            "bytes_written": sum(w["metrics"]["bytes_written"] for w in windows if "metrics" in w),
            "schema_version": self.schema.version,
            "partitions": per_part,
        }


def resolve_keep_tombstones(tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    """Per-key argmax(commit_seq) keeping tombstone winners (needed while
    later windows may still merge against this state).

    Implemented as an int64 key-hash lexsort instead of a string-keyed
    sort+unique: the hot loop touches (hash, seq) int columns only
    (~16 B/row) rather than row-encoded string keys, and the final
    ``take`` gathers winner rows once. Exactness is preserved under hash
    collisions: any sort run whose adjacent rows hash equal but compare
    key-unequal (a real 64-bit collision, ~2^-64 per pair) is re-resolved
    exactly via polars on just those rows.

    EQUAL-seq tie rule: the LAST row in table order wins. Within a lake
    read the concatenation order is the ledger-replay file order, so a
    later-COMMITTED window beats an earlier one at the same commit_seq —
    this is what makes a replication re-sync (pipelines/replicate, which
    stamps its repair rows at the watermark seq) deterministically
    authoritative over rows an earlier window wrote at that same seq.
    Normal CDC feeds never emit two seqs for one key, so the rule only
    ever decides repair/heal windows and malformed duplicate feeds.
    """
    if tbl.num_rows == 0:
        return tbl
    import numpy as np

    from ..util import hash64_column

    h = hash64_column(tbl, key_cols).to_numpy(zero_copy_only=False)
    seq = tbl[SEQ_COL].to_numpy(zero_copy_only=False)
    idx = np.arange(len(h))
    # by hash asc, then seq desc, then position desc (last arrival wins
    # equal-seq ties — see the tie rule in the docstring)
    order = np.lexsort((-idx, -seq, h))
    hs = h[order]
    run_start = np.ones(len(hs), dtype=bool)
    run_start[1:] = hs[1:] != hs[:-1]

    # rows that continue a run must share the key with their predecessor;
    # verify with one vectorized compare over just those pairs
    cont = np.nonzero(~run_start)[0]
    dirty_runs: set[int] = set()
    if cont.size:
        cur = pa.array(order[cont])
        prev = pa.array(order[cont - 1])
        same = np.ones(cont.size, dtype=bool)
        for k in key_cols:
            col = tbl[k]
            a = col.take(cur)
            b = col.take(prev)
            eq = pc.equal(a, b)
            same &= pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        if not same.all():
            # real hash collision: find the run ids affected
            run_id = np.cumsum(run_start) - 1
            for i in cont[~same]:
                dirty_runs.add(int(run_id[i]))

    if not dirty_runs:
        winners = order[run_start]
        return tbl.take(pa.array(np.sort(winners)))

    # rare exact path: resolve dirty runs with full string keys
    run_id = np.cumsum(run_start) - 1
    dirty_mask_sorted = np.isin(run_id, list(dirty_runs))
    clean_winners = order[run_start & ~dirty_mask_sorted]
    dirty_rows = order[dirty_mask_sorted]
    sub = tbl.take(pa.array(dirty_rows))
    # helper-name collision guard: this path is generic over payload
    # columns (reachable whenever a null key and an empty-string key
    # share a batch — they hash equal), so a user column literally
    # named "__pos" must survive untouched
    pos_col = "__pos"
    while pos_col in sub.column_names:
        pos_col += "_"
    df = pl.from_arrow(sub).with_columns(pl.Series(pos_col, dirty_rows))
    fixed = (
        # seq desc then original position desc: polars sort is not
        # guaranteed stable, and the tie rule (docstring) needs the
        # LAST-arriving row to win equal-seq ties here too
        df.sort([SEQ_COL, pos_col], descending=[True, True])
        .unique(subset=key_cols, keep="first", maintain_order=True)
        .drop(pos_col)
        .to_arrow()
        .cast(tbl.schema)
    )
    main = tbl.take(pa.array(np.sort(clean_winners)))
    return pa.concat_tables([main, fixed])
