"""CDC replay driver: tail the change log in micro-batch windows.

The Ray-Data analog of the reference's batch ingest loop
(server/logfiles/uploader.go:50-151 — glob closed log files, process
each once, mark status, archive): here a "file" is a commit_seq window
of the Parquet change log, "status" is the lake's checkpoint ledger,
and processing is one streaming Dataset pipeline per window:

    read_parquet(log, filter=seq ∈ (lo, hi])      # pruned at the read
      -> map_batches(enrichment chain)            # M1..M5 equivalents
      -> lake.apply_window(...)                   # shuffle by key-hash,
                                                  # per-partition LWW delta

Resume: the next window starts after the ledger's max committed hi;
re-running a committed window is a no-op (apply_window skips), and a
window that crashed mid-apply is invisible and simply re-runs —
replay from any checkpoint reproduces identical table state because the
merge is idempotent and order-independent.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..sinks.lake import SEQ_COL, LakeTable
from ..sources.readers import read_parquet_clean

EnrichFn = Callable[[pa.Table], pa.Table]


def changelog_max_seq(log_path: str) -> int:
    """Max commit_seq from parquet footer stats — no data scan."""
    import glob
    import os

    files = (
        sorted(glob.glob(os.path.join(log_path, "*.parquet")))
        if os.path.isdir(log_path)
        else [log_path]
    )
    hi = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(SEQ_COL)
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is not None and stats.max is not None:
                hi = max(hi, stats.max)
    return hi


class Replayer:
    def __init__(
        self,
        changelog_path: str,
        lake: LakeTable,
        window_size: int = 100_000,
        enrichers: list[EnrichFn] | None = None,
    ):
        self.changelog_path = changelog_path
        self.lake = lake
        self.window_size = window_size
        self.enrichers = enrichers or []
        self._file_stats = self._scan_file_stats()
        self._row_bytes = self._estimate_row_bytes()

    def _scan_file_stats(self) -> list[tuple[str, int, int]]:
        """(path, min_seq, max_seq) per log file from parquet footers —
        one metadata pass at startup, reused by every window to prune the
        file list BEFORE the read. Without this, Ray spreads read blocks
        over all files and a window's rows land on the few tasks that
        happen to own its files (measured: effective read parallelism 8
        of 32 on a 100-file log)."""
        import glob
        import os

        files = (
            sorted(glob.glob(os.path.join(self.changelog_path, "*.parquet")))
            if os.path.isdir(self.changelog_path)
            else [self.changelog_path]
        )
        out = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(SEQ_COL)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.min is not None:
                    mins.append(st.min)
                    maxs.append(st.max)
            if mins:
                out.append((f, min(mins), max(maxs)))
        return out

    def _estimate_row_bytes(self) -> int:
        """Uncompressed bytes/row from the first log file's footer — used to
        size read blocks (Ray's default splits a window into hundreds of
        sub-MB blocks, and per-block overhead then dwarfs useful work)."""
        if not self._file_stats:
            return 512
        md = pq.ParquetFile(self._file_stats[0][0]).metadata
        total = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        return max(64, total // max(1, md.num_rows))

    def _window_num_blocks(self, n_rows: int) -> int:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        by_bytes = n_rows * self._row_bytes // (64 * 1024 * 1024) + 1
        return int(min(max(by_bytes, cpus), 8 * cpus))

    def window_dataset(self, lo: int, hi: int) -> "ray.data.Dataset":
        paths = [f for f, mn, mx in self._file_stats if mx > lo and mn <= hi]
        if not paths:
            paths = [f for f, _, _ in self._file_stats] or self.changelog_path
        ds = read_parquet_clean(
            paths,
            filter=(pc.field(SEQ_COL) > lo) & (pc.field(SEQ_COL) <= hi),
            override_num_blocks=self._window_num_blocks(hi - lo),
        )
        for fn in self.enrichers:
            ds = ds.map_batches(fn, batch_format="pyarrow")
        return ds

    def run(
        self,
        max_seq: int | None = None,
        compact_every: int = 8,
        compact_at_end: bool = True,
    ) -> dict:
        """Replay all uncommitted windows; returns run metrics."""
        if max_seq is None:
            max_seq = changelog_max_seq(self.changelog_path)
        start_hi = self.lake.last_committed_hi()
        lo = start_hi
        t0 = time.perf_counter()
        n_windows = 0
        while lo < max_seq:
            hi = min(lo + self.window_size, max_seq)
            ds = self.window_dataset(lo, hi)
            self.lake.apply_window(ds, lo, hi)
            n_windows += 1
            # seq-range windows: nothing below `hi` can arrive later, so
            # compaction may drop tombstones up to the committed watermark
            if compact_every and n_windows % compact_every == 0:
                self.lake.compact(min_files=4, tombstone_watermark=hi)
            lo = hi
        if compact_at_end:
            self.lake.compact(min_files=2, tombstone_watermark=self.lake.last_committed_hi())
        wall = time.perf_counter() - t0
        events = max_seq - start_hi
        return {
            "windows": n_windows,
            "events": events,
            "wall_sec": wall,
            "events_per_sec": events / wall if wall > 0 else float("inf"),
        }


def replay_changelog(
    changelog_path: str,
    lake_dir: str,
    key_cols: tuple[str, ...] = ("repo", "path"),
    num_partitions: int = 64,
    window_size: int = 100_000,
    enrichers: list[EnrichFn] | None = None,
    **run_kw,
) -> tuple[LakeTable, dict]:
    """One-call convenience: create/open lake, replay to head, return both."""
    lake = LakeTable.create(lake_dir, list(key_cols), num_partitions)
    rep = Replayer(changelog_path, lake, window_size, enrichers)
    metrics = rep.run(**run_kw)
    return lake, metrics
