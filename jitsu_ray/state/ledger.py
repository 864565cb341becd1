"""Checkpoint ledger: the lake's commit log.

One JSON file per committed action (window apply / compaction), named by
a monotonically increasing sequence number and written atomically
(tmp + rename). The set of live data files is derived by replaying the
ledger, so data files staged by a crashed window (no ledger row) are
invisible — this plus deterministic per-window delta paths gives the
exactly-once story (SURVEY.md §7.4): re-running a window overwrites its
own staged files and commits at most one ledger row.

Replaces the reference's per-file upload status JSONs
(server/logfiles/status_manager.go:32-110) and Redis interval
signatures (server/synchronization/task_executor.go:210-232) with a
single strictly-ordered commit log.
"""

from __future__ import annotations

import json
import os
import tempfile


class Ledger:
    def __init__(self, dir_path: str):
        self.dir = dir_path
        os.makedirs(self.dir, exist_ok=True)

    def _seq_of(self, name: str) -> int:
        return int(name.split(".")[0])

    def entries(self) -> list[dict]:
        names = sorted(n for n in os.listdir(self.dir) if n.endswith(".json"))
        out = []
        for n in names:
            with open(os.path.join(self.dir, n)) as f:
                e = json.load(f)
            e["_seq"] = self._seq_of(n)
            out.append(e)
        return out

    def next_seq(self) -> int:
        names = [n for n in os.listdir(self.dir) if n.endswith(".json")]
        return 1 + max((self._seq_of(n) for n in names), default=0)

    def append(self, entry: dict) -> int:
        seq = self.next_seq()
        final = os.path.join(self.dir, f"{seq:08d}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, final)
        return seq

    # -- derived state ------------------------------------------------------

    def live_files(self, as_of_hi: int | None = None) -> dict[int, list[str]]:
        """Replay the ledger into {partition: [relative file paths]}.

        ``as_of_hi``: TIME TRAVEL — include only windows whose ``hi`` is
        within the bound. The whole ledger is scanned (not stopped at
        the first excluded window): a recovery re-apply
        (Replayer.replay_spooled, force=True) legally commits a
        LOWER-hi window after higher ones, and it must be part of the
        as-of view. Compactions stay safe only while no window has been
        excluded yet (they then fold included windows exclusively);
        once any window is excluded, later compactions may fold
        excluded data and are skipped — if such a compaction vacuumed
        needed deltas, the read raises FileNotFoundError (the standard
        lakehouse time-travel-until-vacuum contract)."""
        parts: dict[int, list[str]] = {}
        skipped_window = False
        for e in self.entries():
            if as_of_hi is not None and e["kind"] == "window" and int(e["hi"]) > as_of_hi:
                skipped_window = True
                continue
            if as_of_hi is not None and e["kind"] == "compact" and skipped_window:
                continue
            if e["kind"] == "window":
                for p, f in e["files"].items():
                    cur = parts.setdefault(int(p), [])
                    if f not in cur:  # forced re-apply commits the same
                        cur.append(f)  # deterministic path twice

            elif e["kind"] == "compact":
                for p, info in e["parts"].items():
                    cur = parts.setdefault(int(p), [])
                    replaced = set(info["replaces"])
                    parts[int(p)] = [f for f in cur if f not in replaced]
                    if info.get("file"):
                        parts[int(p)].append(info["file"])
        return parts

    def last_committed_hi(self) -> int:
        hi = 0
        for e in self.entries():
            if e["kind"] == "window":
                hi = max(hi, int(e["hi"]))
        return hi

    def window_metrics(self) -> list[dict]:
        return [e for e in self.entries() if e["kind"] == "window"]
