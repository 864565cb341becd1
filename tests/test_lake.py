"""Jitsu-analog lake scenarios (FIXTURES.md F3): dedup, out-of-order LWW,
tombstones + resurrection, resume/idempotent replay, skew spreading."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jitsu_ray.sinks.lake import LakeTable
from jitsu_ray.util import hash_mod_column


def ev(seq, op, repo, path, commit=None, lang=None, content=None):
    return {
        "commit_seq": seq,
        "op": op,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }


def make_ds(rows):
    import ray.data

    tbl = pa.table(
        {
            "commit_seq": pa.array([r["commit_seq"] for r in rows], pa.int64()),
            "op": pa.array([r["op"] for r in rows], pa.string()),
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.large_string()),
        }
    )
    return ray.data.from_arrow(tbl)


def read_rows(lake):
    rows = lake.read().take_all()
    return {(r["repo"], r["path"]): r for r in rows}


def new_lake(tmp_path, parts=4):
    return LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], parts)


def test_dedup_same_event_five_times(ray_session, tmp_path):
    # postgres_primary_keys_test.go:23-89 analog: 5 deliveries of the same
    # event (same key, same seq) across two windows => exactly 1 row.
    lake = new_lake(tmp_path)
    e = ev(1, "insert", "r", "p", "c1", "py", "body-v1")
    lake.apply_window(make_ds([e, e, e]), 0, 1)
    lake.apply_window(make_ds([e, e]), 1, 2)
    rows = read_rows(lake)
    assert len(rows) == 1
    assert rows[("r", "p")]["content"] == "body-v1"


def test_out_of_order_within_and_across_windows(ray_session, tmp_path):
    lake = new_lake(tmp_path)
    # window 1 delivers seqs shuffled; window 2 delivers a LOWER seq late
    w1 = [
        ev(5, "update", "r", "p", "c5", "py", "v5"),
        ev(2, "update", "r", "p", "c2", "py", "v2"),
        ev(4, "update", "r", "p", "c4", "py", "v4"),
    ]
    w2 = [ev(3, "update", "r", "p", "c3", "py", "v3")]  # late, stale
    lake.apply_window(make_ds(w1), 0, 1)
    lake.apply_window(make_ds(w2), 1, 2)
    rows = read_rows(lake)
    assert rows[("r", "p")]["content"] == "v5"
    assert rows[("r", "p")]["commit_seq"] == 5


def test_tombstone_and_resurrection(ray_session, tmp_path):
    lake = new_lake(tmp_path)
    lake.apply_window(
        make_ds(
            [
                ev(1, "insert", "r", "a", "c1", "py", "a1"),
                ev(2, "insert", "r", "b", "c2", "py", "b1"),
            ]
        ),
        0,
        1,
    )
    lake.apply_window(
        make_ds([ev(3, "delete", "r", "a"), ev(4, "delete", "r", "b")]), 1, 2
    )
    rows = read_rows(lake)
    assert rows == {} or ("r", "a") not in rows and ("r", "b") not in rows
    # resurrection: later re-insert wins over the tombstone
    lake.apply_window(make_ds([ev(5, "insert", "r", "a", "c5", "py", "a2")]), 2, 3)
    rows = read_rows(lake)
    assert set(rows) == {("r", "a")}
    assert rows[("r", "a")]["content"] == "a2"


def test_late_update_does_not_resurrect_after_compaction(ray_session, tmp_path):
    # delete at seq 10 compacted with watermark 0 (disorder possible):
    # a late stale update (seq 5) must NOT resurrect the key.
    lake = new_lake(tmp_path)
    lake.apply_window(make_ds([ev(1, "insert", "r", "p", "c1", "py", "v1")]), 0, 1)
    lake.apply_window(make_ds([ev(10, "delete", "r", "p")]), 1, 2)
    lake.compact(min_files=1, tombstone_watermark=0)  # keeps the tombstone
    lake.apply_window(make_ds([ev(5, "update", "r", "p", "c5", "py", "v5")]), 2, 3)
    assert read_rows(lake) == {}


def test_resume_is_idempotent(ray_session, tmp_path):
    lake = new_lake(tmp_path)
    w1 = [ev(1, "insert", "r", "p", "c1", "py", "v1")]
    w2 = [ev(2, "update", "r", "p", "c2", "py", "v2")]
    lake.apply_window(make_ds(w1), 0, 1)
    lake.apply_window(make_ds(w2), 1, 2)
    before = read_rows(lake)
    # simulated restart: re-apply both windows (ledger skips), then a fresh
    # LakeTable.open sees identical state
    assert lake.apply_window(make_ds(w1), 0, 1).get("skipped")
    assert lake.apply_window(make_ds(w2), 1, 2).get("skipped")
    lake2 = LakeTable.open(lake.dir)
    assert read_rows(lake2) == before
    assert lake2.last_committed_hi() == 2


def test_crash_before_commit_invisible(ray_session, tmp_path):
    # a delta staged without a ledger row must not be readable
    lake = new_lake(tmp_path, parts=2)
    lake.apply_window(make_ds([ev(1, "insert", "r", "p", "c1", "py", "v1")]), 0, 1)
    # simulate a crashed window: orphan delta file on disk, no ledger row
    part_dir = os.path.join(lake.dir, "part=00000")
    os.makedirs(part_dir, exist_ok=True)
    orphan = pa.table(
        {
            "__part": pa.array([0], pa.int32()),
            "op": pa.array(["insert"], pa.string()),
            "commit_seq": pa.array([99], pa.int64()),
            "repo": pa.array(["r"], pa.large_string()),
            "path": pa.array(["p"], pa.large_string()),
            "commit": pa.array(["cx"], pa.large_string()),
            "lang": pa.array(["py"], pa.large_string()),
            "content": pa.array(["ORPHAN"], pa.large_string()),
        }
    )
    pq.write_table(orphan, os.path.join(part_dir, "delta-000000000001-000000000099.parquet"))
    rows = read_rows(lake)
    assert rows[("r", "p")]["content"] == "v1"  # orphan invisible


def test_compaction_preserves_state(ray_session, tmp_path):
    lake = new_lake(tmp_path)
    for i in range(1, 6):
        lake.apply_window(
            make_ds([ev(i, "update" if i > 1 else "insert", "r", "p", f"c{i}", "py", f"v{i}")]),
            i - 1,
            i,
        )
    before = read_rows(lake)
    entry = lake.compact(min_files=2, tombstone_watermark=5)
    assert entry["parts"]
    assert read_rows(lake) == before
    files = lake.live_files()
    assert all(len(fs) == 1 for fs in files.values())


def test_skew_spread_and_equivalence(ray_session, tmp_path):
    # one hot repo owning most events still spreads across partitions
    # because the partition key hashes (repo, path) — SURVEY §7.3 salting.
    rows = [
        ev(i, "insert", "hot/repo", f"f{i}.py", f"c{i}", "py", f"v{i}")
        for i in range(1, 101)
    ]
    tbl = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows]),
            "path": pa.array([r["path"] for r in rows]),
        }
    )
    parts = set(hash_mod_column(tbl, ["repo", "path"], 8).to_pylist())
    assert len(parts) >= 6  # spread over most of 8 buckets
    lake = new_lake(tmp_path, parts=8)
    lake.apply_window(make_ds(rows), 0, 100)
    assert len(read_rows(lake)) == 100


def test_open_rejects_foreign_hash_algo(tmp_path):
    import json

    from jitsu_ray.sinks.lake import LakeTable

    lake = LakeTable.create(str(tmp_path / "lake"), ["k"], 4)
    meta_path = str(tmp_path / "lake" / "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["hash_algo"] == "polars-xxhash64-seed42"
    meta["hash_algo"] = "some-other-hash-v2"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="hash_algo"):
        LakeTable.open(str(tmp_path / "lake"))


def test_hash_self_test_known_answers():
    from jitsu_ray.util import hash_self_test

    hash_self_test()  # raises on polars xxhash64 drift


def test_split_block_routes_only_owned_rows(ray_session):
    import numpy as np
    import ray as _ray

    from jitsu_ray.sinks.lake import PART_COL, _split_block

    rng = np.random.default_rng(0)
    parts = rng.integers(0, 16, size=1000)
    block = pa.table(
        {PART_COL: pa.array(parts, pa.int32()), "v": pa.array(range(1000), pa.int64())}
    )
    pool = 4
    refs = _split_block.options(num_returns=pool).remote(_ray.put(block), pool)
    slices = _ray.get(list(refs))
    total = 0
    for g, s in enumerate(slices):
        got = np.asarray(s[PART_COL].to_numpy(zero_copy_only=False)) % pool
        assert (got == g).all()  # merger g receives ONLY its groups' rows
        total += s.num_rows
    assert total == 1000  # nothing lost, nothing duplicated


def test_exchange_split_mode_equivalent_state(ray_session, tmp_path):
    """Forced pre-split exchange (the multi-node path) converges to the
    same lake state as the shared-ref path."""
    import ray.data

    from jitsu_ray.sinks.lake import LakeTable
    from jitsu_ray.testgen import gen_changelog

    tbl = gen_changelog(n_events=4000, n_repos=12, seed=21)

    def run(mode, name):
        lake = LakeTable.create(str(tmp_path / name), ["repo", "path"], 8)
        lake.exchange_mode = mode
        lake.apply_window(ray.data.from_arrow(tbl.slice(0, 2000)), 0, 2000)
        lake.apply_window(ray.data.from_arrow(tbl.slice(2000, 2000)), 2000, 4000)
        rows = lake.read().take_all()
        return sorted((r["repo"], r["path"], r["commit_seq"], r["content"]) for r in rows)

    assert run("split", "lake_split") == run("shared", "lake_shared")


def test_metrics_registry_counters_and_gauges(ray_session, tmp_path):
    """A3/A4: lake windows push success counters + throughput/pool
    gauges to the named registry; sink reports land as counters too."""
    import ray as _ray
    import ray.data

    from jitsu_ray.sinks.lake import LakeTable
    from jitsu_ray.state.metrics import get_metrics, record_sink_report
    from jitsu_ray.testgen import gen_changelog

    metrics = get_metrics("metrics_test")
    _ray.get(metrics.reset.remote())
    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 4)
    lake.attach_metrics(metrics)
    tbl = gen_changelog(n_events=2000, n_repos=8, seed=3)
    lake.apply_window(ray.data.from_arrow(tbl.slice(0, 1000)), 0, 1000)
    lake.apply_window(ray.data.from_arrow(tbl.slice(1000, 1000)), 1000, 2000)
    record_sink_report(metrics, {"written": 10, "dead": 2, "max_attempts_seen": 3})
    snap = _ray.get(metrics.snapshot.remote())
    assert snap["counters"]["lake.windows"] == 2
    assert snap["counters"]["lake.rows_written"] > 0
    assert snap["gauges"]["lake.events_per_sec"] > 0
    assert snap["gauges"]["lake.partition_rows_max"] > 0
    assert snap["counters"]["sink.written"] == 10
    assert snap["counters"]["sink.dead_lettered"] == 2
    assert snap["gauges"]["sink.attempts_max"] == 3


def test_int64_key_roundtrips_dtype_exactly(ray_session, tmp_path):
    # round-2 verdict #1: key cols were hard-coded large_string, so an
    # int64 PK came back as "5". Types must now be frozen at the first
    # window and round-trip exactly (reference adapters/table.go:13-23).
    import ray.data

    lake = LakeTable.create(str(tmp_path / "ilake"), ["event_id"], 4)
    tbl = pa.table(
        {
            "commit_seq": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["insert"] * 3, pa.string()),
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "payload": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    lake.apply_window(ray.data.from_arrow(tbl), 0, 3)
    out = lake.read().take_all()
    assert sorted(r["event_id"] for r in out) == [10, 11, 12]
    assert all(isinstance(r["event_id"], int) for r in out)
    sch = lake.full_arrow_schema()
    assert sch.field("event_id").type == pa.int64()
    # reopened handle sees the frozen type from _meta.json
    reopened = LakeTable.open(str(tmp_path / "ilake"))
    assert reopened.full_arrow_schema().field("event_id").type == pa.int64()
    # a later window delivering the key as strings is cast back to the
    # frozen int64 type (keys are never retyped)
    tbl2 = pa.table(
        {
            "commit_seq": pa.array([4], pa.int64()),
            "op": pa.array(["update"], pa.string()),
            "event_id": pa.array(["10"], pa.string()),
            "payload": pa.array(["a2"], pa.string()),
        }
    )
    reopened.apply_window(ray.data.from_arrow(tbl2), 3, 4)
    rows = {r["event_id"]: r["payload"] for r in reopened.read().take_all()}
    assert rows == {10: "a2", 11: "b", 12: "c"}


def test_delete_where_on_int64_keys(ray_session, tmp_path):
    import ray.data
    import pyarrow.compute as pc

    lake = LakeTable.create(str(tmp_path / "dlake"), ["event_id"], 4)
    tbl = pa.table(
        {
            "commit_seq": pa.array([1, 2, 3, 4], pa.int64()),
            "op": pa.array(["insert"] * 4, pa.string()),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "kind": pa.array(["keep", "drop", "keep", "drop"], pa.string()),
        }
    )
    lake.apply_window(ray.data.from_arrow(tbl), 0, 4)
    lake.delete_where(lambda b: pc.equal(b["kind"], "drop"))
    out = sorted(r["event_id"] for r in lake.read().take_all())
    assert out == [1, 3]


def test_legacy_lake_pins_string_keys(ray_session, tmp_path):
    # round-3 review: a lake created before key_types existed already
    # stores stringified keys; opening it with typed input must pin
    # STRING, not the incoming window's type
    import json

    import ray.data

    lake = LakeTable.create(str(tmp_path / "legacy"), ["event_id"], 4)
    meta_path = str(tmp_path / "legacy" / "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    del meta["key_types"]  # simulate a pre-round-3 lake
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    def win(seqs, ids, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "commit_seq": pa.array(seqs, pa.int64()),
                    "op": pa.array(["insert"] * len(seqs), pa.string()),
                    "event_id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.string()),
                }
            )
        )

    legacy = LakeTable.open(str(tmp_path / "legacy"))
    legacy.apply_window(win([1], [5], ["a"]), 0, 1)  # no data yet: int64 pinned is fine
    # now simulate the true legacy case: committed data, key_types lost
    with open(meta_path) as f:
        meta = json.load(f)
    del meta["key_types"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    reopened = LakeTable.open(str(tmp_path / "legacy"))
    reopened.apply_window(win([2], [6], ["b"]), 1, 2)
    # committed (stringified-by-pre-round-3-rules) files must stay readable:
    # keys pinned STRING, both rows come back
    assert reopened.full_arrow_schema().field("event_id").type == pa.large_string()
    rows = {r["event_id"]: r["v"] for r in reopened.read().take_all()}
    assert len(rows) == 2


def test_time_travel_read(ray_session, tmp_path):
    # as_of reads reconstruct the state at any committed window boundary
    lake = new_lake(tmp_path)
    lake.apply_window(make_ds([ev(1, "insert", "r", "p1", "c1", "py", "v1")]), 0, 1)
    lake.apply_window(make_ds([ev(2, "insert", "r", "p2", "c2", "py", "v2")]), 1, 2)
    lake.apply_window(make_ds([ev(3, "delete", "r", "p1", None, None, None)]), 2, 3)

    now = {(r["repo"], r["path"]) for r in lake.read().take_all()}
    assert now == {("r", "p2")}
    at2 = {(r["repo"], r["path"]) for r in lake.read(as_of=2).take_all()}
    assert at2 == {("r", "p1"), ("r", "p2")}
    at1 = {(r["repo"], r["path"]) for r in lake.read(as_of=1).take_all()}
    assert at1 == {("r", "p1")}
    assert lake.read(as_of=0).take_all() == []
    # a compaction folding windows BEYOND as_of vacuums that history:
    # the time-travel read must fail loudly, not silently mis-answer
    lake.compact(min_files=1, tombstone_watermark=0)
    with pytest.raises(FileNotFoundError):
        lake.read(as_of=2)
    # current state unaffected
    assert {(r["repo"], r["path"]) for r in lake.read().take_all()} == {("r", "p2")}


def test_time_travel_includes_late_spooled_window(ray_session, tmp_path):
    # replay_spooled commits a LOWER-hi window after higher ones
    # (force=True); a time-travel read within the bound must include it
    lake = new_lake(tmp_path)
    lake.apply_window(make_ds([ev(2, "insert", "r", "pA", "c", "py", "vA")]), 1, 2)
    # window (2,4] commits BEFORE the recovered window (0,1]
    lake.apply_window(make_ds([ev(4, "insert", "r", "pB", "c", "py", "vB")]), 2, 4)
    lake.apply_window(make_ds([ev(1, "insert", "r", "pC", "c", "py", "vC")]), 0, 1, force=True)
    at2 = {(r["repo"], r["path"]) for r in lake.read(as_of=2).take_all()}
    assert at2 == {("r", "pA"), ("r", "pC")}  # pC committed late but hi<=2
    allofit = {(r["repo"], r["path"]) for r in lake.read().take_all()}
    assert allofit == {("r", "pA"), ("r", "pB"), ("r", "pC")}


def test_ledger_append_concurrent_writers(tmp_path):
    # round-3 verdict: two independent writer processes must not
    # last-writer-wins each other's ledger row — seqs are claimed via
    # atomic hard link, losers re-scan and retry
    from concurrent.futures import ThreadPoolExecutor

    from jitsu_ray.state.ledger import Ledger

    d = str(tmp_path / "ledger")

    def writer(tag):
        led = Ledger(d)  # each writer its own instance (process analog)
        return [
            led.append({"kind": "window", "lo": i, "hi": i + 1, "tag": tag})
            for i in range(25)
        ]

    with ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(writer, t) for t in range(4)]
        seqs = [s for f in futs for s in f.result()]
    assert sorted(seqs) == list(range(1, 101))  # no lost or duplicate seq
    entries = Ledger(d).entries()
    assert len(entries) == 100
    assert sorted((e["tag"], e["lo"]) for e in entries) == sorted(
        (t, i) for t in range(4) for i in range(25)
    )


def test_concurrent_apply_window_two_writers(ray_session, tmp_path):
    # two driver-side writers (separate LakeTable instances on one lake
    # dir) applying different windows concurrently: both ledger rows
    # land, key types pin once (meta lock), read sees both windows
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "lake")
    l1 = LakeTable.create(path, ["repo", "path"], 4)
    l2 = LakeTable.open(path)

    def w(lake, seq, p, lo, hi):
        return lake.apply_window(
            make_ds([ev(seq, "insert", "r", p, "c", "py", f"v{seq}")]),
            lo, hi, force=True,
        )

    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(w, l1, 1, "p1", 0, 1)
        f2 = ex.submit(w, l2, 2, "p2", 1, 2)
        e1, e2 = f1.result(), f2.result()
    assert not e1.get("skipped") and not e2.get("skipped")
    lake = LakeTable.open(path)
    assert set(read_rows(lake)) == {("r", "p1"), ("r", "p2")}
    assert len(lake.ledger.window_metrics()) == 2
    assert lake.key_types["repo"].name == "STRING"


def test_diff_as_of(ray_session, tmp_path):
    # value-level CDC diff between two committed states: insert (new
    # key), update (content changed), delete (tombstoned), and a NO-OP
    # re-upsert with identical values (must NOT appear)
    lake = new_lake(tmp_path)
    lake.apply_window(
        make_ds(
            [
                ev(1, "insert", "r", "p1", "c1", "py", "v1"),
                ev(2, "insert", "r", "p2", "c2", "py", "v2"),
                ev(3, "insert", "r", "p3", "c3", "py", "v3"),
            ]
        ),
        0,
        3,
    )
    lake.apply_window(
        make_ds(
            [
                ev(4, "update", "r", "p2", "c2b", "py", "v2-new"),  # update
                ev(5, "insert", "r", "p4", "c4", "py", "v4"),       # insert
                ev(6, "delete", "r", "p3", None, None, None),       # delete
                ev(7, "update", "r", "p1", "c1", "py", "v1"),       # no-op
            ]
        ),
        3,
        7,
    )
    got = {
        (r["repo"], r["path"]): r["change"]
        for r in lake.diff_as_of(3, 7).take_all()
    }
    assert got == {
        ("r", "p2"): "update",
        ("r", "p4"): "insert",
        ("r", "p3"): "delete",
    }
    # delete rows carry the last-known a-side values
    [del_row] = [
        r for r in lake.diff_as_of(3, 7).take_all() if r["change"] == "delete"
    ]
    assert del_row["content"] == "v3"
    # identical cutoffs diff to empty; reversed cutoffs are an error
    assert lake.diff_as_of(7, 7).take_all() == []
    with pytest.raises(ValueError):
        lake.diff_as_of(7, 3)
    # diff from seq 0 (empty state) is all inserts of the live state
    all_in = lake.diff_as_of(0, 7).take_all()
    assert {r["change"] for r in all_in} == {"insert"} and len(all_in) == 3


def test_incremental_agg_view(ray_session, tmp_path):
    import ray.data

    from jitsu_ray.pipelines.matview import IncrementalAggView

    def ds_of(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "commit_seq": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "uid": pa.array([r[2] for r in rows], pa.int64()),
                    "grp": pa.array([r[3] for r in rows], pa.string()),
                    "val": pa.array([r[4] for r in rows], pa.int64()),
                }
            )
        )

    lake = LakeTable.create(str(tmp_path / "lake"), ["uid"], 4)
    lake.apply_window(
        ds_of([(1, "insert", 1, "a", 10), (2, "insert", 2, "a", 20),
               (3, "insert", 3, "b", 30)]),
        0, 3,
    )
    view = IncrementalAggView(str(tmp_path / "view"), lake, ["grp"], ["val"])
    m1 = view.refresh()
    assert m1["from_seq"] == 0 and m1["to_seq"] == 3

    def snap():
        return {
            r["grp"]: (r["n"], r["sum_val"]) for r in view.read().to_pylist()
        }

    assert snap() == {"a": (2, 30), "b": (1, 30)}
    # incremental wave: value update (a stays), group move (b -> a),
    # fresh insert (b), delete (a)
    lake.apply_window(
        ds_of([(4, "update", 2, "a", 25), (5, "update", 3, "a", 35),
               (6, "insert", 4, "b", 40), (7, "delete", 1, None, None)]),
        3, 7,
    )
    view.refresh()
    assert snap() == {"a": (2, 60), "b": (1, 40)}
    # the view must equal a direct recompute over the current state
    rows = lake.read().take_all()
    direct = {}
    for r in rows:
        n, s = direct.get(r["grp"], (0, 0))
        direct[r["grp"]] = (n + 1, s + r["val"])
    assert snap() == direct
    # idempotent: refresh at an unchanged seq is a no-op
    assert view.refresh()["changed_groups"] == 0
    # a group emptied entirely disappears from the view
    import pyarrow.compute as pc

    lake.delete_where(lambda b: pc.equal(b["grp"], "b"))
    view.refresh()
    assert snap() == {"a": (2, 60)}


def test_incremental_agg_view_float_and_rebuild(ray_session, tmp_path):
    import ray.data

    from jitsu_ray.pipelines.matview import IncrementalAggView

    def ds_of(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "commit_seq": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "uid": pa.array([r[2] for r in rows], pa.int64()),
                    "grp": pa.array([r[3] for r in rows], pa.string()),
                    "val": pa.array([r[4] for r in rows], pa.float64()),
                }
            )
        )

    lake = LakeTable.create(str(tmp_path / "lake"), ["uid"], 4)
    lake.apply_window(
        ds_of([(1, "insert", 1, "a", 10.5), (2, "insert", 2, "a", 20.25)]),
        0, 2,
    )
    view = IncrementalAggView(str(tmp_path / "view"), lake, ["grp"], ["val"])
    m = view.refresh()
    assert m["mode"] == "incremental"
    [row] = view.read().to_pylist()
    # float sums must NOT truncate (10.5 + 20.25, not 10 + 20)
    assert row == {"grp": "a", "n": 2, "sum_val": 30.75}
    # vacuum the view's watermark history: compact folds the delta away
    lake.apply_window(ds_of([(3, "insert", 3, "b", 1.5)]), 2, 3)
    lake.compact(min_files=1, tombstone_watermark=0)
    m2 = view.refresh()
    assert m2["mode"] == "rebuild"
    got = {r["grp"]: (r["n"], r["sum_val"]) for r in view.read().to_pylist()}
    assert got == {"a": (2, 30.75), "b": (1, 1.5)}
    # watermark survived the rebuild: next refresh is a no-op
    assert view.refresh()["mode"] == "noop"
    # system/key columns rejected up front
    with pytest.raises(ValueError):
        IncrementalAggView(str(tmp_path / "v2"), lake, ["grp"], ["commit_seq"])
    with pytest.raises(ValueError):
        IncrementalAggView(str(tmp_path / "v3"), lake, ["grp"], ["uid"])


# ---- zone-map point lookup ----------------------------------------------


def _lookup_lake(tmp_path, parts=8):
    """Three windows with disjoint composite-key ranges so zone maps can
    prune; one cross-window update so LWW matters."""
    lake = new_lake(tmp_path, parts=parts)
    for w, lo in enumerate([0, 100, 200]):
        rows = [
            ev(lo + i, "insert", f"r{lo + i:04d}", "f.py", commit=f"c{lo + i}",
               lang="py", content=f"body {lo + i}")
            for i in range(100)
        ]
        lake.apply_window(make_ds(rows), lo, lo + 100)
    lake.apply_window(
        make_ds([ev(900, "insert", "r0050", "f.py", commit="c900",
                    lang="py", content="updated")]),
        300, 901,
    )
    return lake


def test_lookup_matches_full_read_and_prunes(ray_session, tmp_path):
    lake = _lookup_lake(tmp_path)
    keys = [{"repo": "r0050", "path": "f.py"}, {"repo": "r0250", "path": "f.py"},
            {"repo": "nope", "path": "f.py"}]
    got = {(r["repo"], r["path"]): r for r in lake.lookup(keys).to_pylist()}
    full = read_rows(lake)
    assert set(got) == {("r0050", "f.py"), ("r0250", "f.py")}
    for k in got:
        assert got[k]["commit"] == full[k]["commit"]
        assert got[k]["content"] == full[k]["content"]
    assert got[("r0050", "f.py")]["content"] == "updated"  # LWW across windows
    st = lake.last_lookup_stats
    assert st["files_read"] < st["files_total"]  # zone maps actually pruned
    assert st["partitions_read"] <= len(keys)


def test_lookup_tombstoned_key_absent(ray_session, tmp_path):
    import pyarrow.compute as pc

    lake = _lookup_lake(tmp_path)
    lake.delete_where(lambda b: pc.equal(b["repo"], "r0010"))
    assert lake.lookup([{"repo": "r0010", "path": "f.py"}]).num_rows == 0


def test_lookup_as_of_sees_pre_delete_state(ray_session, tmp_path):
    import pyarrow.compute as pc

    lake = _lookup_lake(tmp_path)
    hi = lake.last_committed_hi()
    lake.delete_where(lambda b: pc.equal(b["repo"], "r0010"))
    out = lake.lookup([{"repo": "r0010", "path": "f.py"}], as_of=hi)
    assert out.num_rows == 1 and out["content"][0].as_py() == "body 10"


def test_lookup_survives_compaction_and_legacy_entries(ray_session, tmp_path):
    import json

    lake = _lookup_lake(tmp_path)
    # simulate a legacy (pre-zone-map) ledger row: strip key_stats
    led = lake.ledger
    names = sorted(
        n for n in os.listdir(led.dir) if n.endswith(".json")
    )
    p0 = os.path.join(led.dir, names[0])
    e = json.load(open(p0))
    e.pop("key_stats", None)
    json.dump(e, open(p0, "w"))
    got = lake.lookup([{"repo": "r0050", "path": "f.py"}])
    assert got.num_rows == 1 and got["content"][0].as_py() == "updated"
    # compaction rewrites files and records fresh stats
    lake.compact()
    got2 = lake.lookup([{"repo": "r0050", "path": "f.py"}])
    assert got2.num_rows == 1 and got2["content"][0].as_py() == "updated"
    st = lake.last_lookup_stats
    assert st["files_read"] <= st["files_total"]


def test_lookup_bloom_prunes_when_zone_maps_cannot(ray_session, tmp_path):
    """String keys spanning the whole alphabet in every file defeat
    [min,max] zone maps (stripped here to simulate / isolate); the
    per-file Bloom sidecar must still prune absent-key files."""
    import json

    lake = _lookup_lake(tmp_path)
    for n in sorted(os.listdir(lake.ledger.dir)):
        if n.endswith(".json"):
            p = os.path.join(lake.ledger.dir, n)
            e = json.load(open(p))
            e.pop("key_stats", None)
            json.dump(e, open(p, "w"))
    got = lake.lookup([{"repo": "r0250", "path": "f.py"}])
    assert got.num_rows == 1 and got["content"][0].as_py() == "body 250"
    st = lake.last_lookup_stats
    assert st["files_zone_skipped"] == 0  # stats stripped
    assert st["files_bloom_skipped"] >= 1  # bloom did the pruning
    assert st["files_read"] < st["files_total"]


def test_lookup_missing_bloom_sidecar_reads_file(ray_session, tmp_path):
    """Legacy lakes have no sidecars: lookup must fall back to reading
    the file (never wrongly prune)."""
    import glob
    import json

    lake = _lookup_lake(tmp_path)
    for b in glob.glob(os.path.join(str(tmp_path / "lake"), "part=*", "*.bloom.npz")):
        os.unlink(b)
    for n in sorted(os.listdir(lake.ledger.dir)):
        if n.endswith(".json"):
            p = os.path.join(lake.ledger.dir, n)
            e = json.load(open(p))
            e.pop("key_stats", None)
            json.dump(e, open(p, "w"))
    got = lake.lookup([{"repo": "r0150", "path": "f.py"}])
    assert got.num_rows == 1 and got["content"][0].as_py() == "body 150"
    st = lake.last_lookup_stats
    assert st["files_bloom_skipped"] == 0 and st["files_zone_skipped"] == 0


def test_compaction_removes_stale_bloom_sidecars(ray_session, tmp_path):
    import glob

    lake = _lookup_lake(tmp_path)
    before = set(glob.glob(os.path.join(str(tmp_path / "lake"), "part=*", "*.bloom.npz")))
    assert before  # write path produced sidecars
    lake.compact()
    after = set(glob.glob(os.path.join(str(tmp_path / "lake"), "part=*", "*.bloom.npz")))
    assert not (before & after)  # replaced deltas' sidecars are gone
    for b in after:
        assert "base-" in os.path.basename(b)  # compacted bases have fresh ones


def test_lookup_empty_keys_returns_empty(ray_session, tmp_path):
    lake = _lookup_lake(tmp_path)
    out = lake.lookup([])
    assert out.num_rows == 0
    assert lake.last_lookup_stats["files_read"] == 0


def test_lookup_as_of_vacuumed_history_raises(ray_session, tmp_path):
    import pyarrow.compute as pc
    import pytest as _pytest

    lake = _lookup_lake(tmp_path)
    hi = lake.last_committed_hi()
    lake.delete_where(lambda b: pc.equal(b["repo"], "r0010"))
    lake.compact(min_files=1)  # vacuum pre-delete deltas
    with _pytest.raises(FileNotFoundError, match="vacuumed"):
        lake.lookup([{"repo": "r0010", "path": "f.py"}], as_of=hi)


def test_lookup_corrupt_bloom_sidecar_fails_open(ray_session, tmp_path):
    import glob

    lake = _lookup_lake(tmp_path)
    for b in glob.glob(os.path.join(str(tmp_path / "lake"), "part=*", "*.bloom.npz")):
        open(b, "wb").write(b"garbage")
    got = lake.lookup([{"repo": "r0150", "path": "f.py"}])
    assert got.num_rows == 1 and got["content"][0].as_py() == "body 150"
    assert lake.last_lookup_stats["files_bloom_skipped"] == 0


def test_ledger_checkpoint_fast_path_equals_full_replay(tmp_path):
    """checkpoint(): the tail-seeded unbounded view must equal a full
    replay — before and after post-checkpoint rows — and be idempotent
    on an already-checkpointed tail."""
    from jitsu_ray.state.ledger import Ledger

    led = Ledger(str(tmp_path / "ledger"))
    for i in range(4):
        led.append(
            {"kind": "window", "lo": i, "hi": i + 1,
             "files": {"0": f"part=00000/delta-{i}.parquet"}}
        )
    led.append(
        {"kind": "compact", "parts": {"0": {
            "file": "part=00000/base-1.parquet",
            "replaces": ["part=00000/delta-0.parquet", "part=00000/delta-1.parquet"],
        }}}
    )
    full = led.live_files(entries=led.entries())
    seq = led.checkpoint()
    assert seq == 6
    assert led.checkpoint() is None  # idempotent: tail already folded
    # fast path (reads back from the checkpoint only) == full replay
    assert led.live_files() == full
    assert led.last_committed_hi() == 4
    assert len(led._tail_entries()) == 1  # just the checkpoint

    # rows after the checkpoint keep accumulating on top of it
    led.append(
        {"kind": "window", "lo": 4, "hi": 5,
         "files": {"0": "part=00000/delta-4.parquet", "3": "part=00003/delta-4.parquet"}}
    )
    assert led.live_files() == led.live_files(entries=led.entries())
    assert led.last_committed_hi() == 5
    assert "part=00003/delta-4.parquet" in led.live_files()[3]


def test_ledger_checkpoint_ignored_by_time_travel(tmp_path):
    """as_of views full-replay and skip checkpoint rows: a checkpoint
    folding windows past the bound must not leak them into the past."""
    from jitsu_ray.state.ledger import Ledger

    led = Ledger(str(tmp_path / "ledger"))
    led.append({"kind": "window", "lo": 0, "hi": 1, "files": {"0": "a.parquet"}})
    led.append({"kind": "window", "lo": 1, "hi": 2, "files": {"0": "b.parquet"}})
    led.checkpoint()
    as_of = led.live_files(as_of_hi=1)
    assert as_of == {0: ["a.parquet"]}


def test_ledger_checkpoint_exact_seq_claim(tmp_path):
    """_append_at claims EXACTLY the requested seq (raises on any
    collision), and checkpoint() re-folds rows that land between its
    read and its claim instead of hiding them."""
    import pytest as _pytest

    from jitsu_ray.state.ledger import Ledger

    led = Ledger(str(tmp_path / "ledger"))
    led.append({"kind": "window", "lo": 0, "hi": 1, "files": {"0": "a.parquet"}})
    with _pytest.raises(FileExistsError):
        led._append_at({"kind": "checkpoint", "hi": 0, "parts": {}}, 1)

    # simulate a concurrent commit landing between fold and claim: the
    # first fold's target seq is taken, checkpoint retries and the
    # final row must include the late window
    real_entries = led.entries

    class Racer:
        def __init__(self):
            self.fired = False

        def __call__(self):
            ents = real_entries()
            if not self.fired:
                self.fired = True
                led.append(
                    {"kind": "window", "lo": 1, "hi": 2, "files": {"0": "late.parquet"}}
                )
            return ents

    led.entries = Racer()
    try:
        seq = led.checkpoint()
    finally:
        led.entries = real_entries
    assert seq is not None
    assert led.live_files() == {0: ["a.parquet", "late.parquet"]}
    assert led.last_committed_hi() == 2


def test_lake_compact_checkpoints_and_stays_readable(ray_session, tmp_path):
    """LakeTable.compact() folds the ledger; reads and resume skip keep
    working across the checkpoint row, and the post-compaction state
    as-of is unchanged."""
    import ray.data

    from jitsu_ray.sinks.lake import LakeTable
    from jitsu_ray.state.ledger import Ledger

    lake = LakeTable.create(str(tmp_path / "lake"), ["k"], 4)

    def win(lo, hi, rows):
        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "v": pa.array([r[1] for r in rows], pa.string()),
                "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
                "op": pa.array(["upsert"] * len(rows), pa.string()),
            }
        )
        lake.apply_window(ray.data.from_arrow(t), lo, hi)

    win(0, 10, [(1, "a", 1), (2, "b", 2)])
    win(10, 20, [(1, "a2", 11), (3, "c", 12)])
    lake.compact(min_files=1)
    led = Ledger(str(tmp_path / "lake" / "_ledger"))
    assert led.entries()[-1]["kind"] == "checkpoint"

    win(20, 30, [(4, "d", 21)])
    got = sorted((r["k"], r["v"]) for r in lake.read().take_all())
    assert got == [(1, "a2"), (2, "b"), (3, "c"), (4, "d")]
    # resume skip still works across the checkpoint row
    assert lake.last_committed_hi() == 30
    # as-of at the compaction fold point (full replay, checkpoint row
    # ignored) still resolves the folded state
    past = sorted((r["k"], r["v"]) for r in lake.read(as_of=20).take_all())
    assert past == [(1, "a2"), (2, "b"), (3, "c")]
    # a fresh process (new instance) opens the checkpointed lake fine
    lake2 = LakeTable.open(str(tmp_path / "lake"))
    assert lake2.last_committed_hi() == 30
    assert sorted(
        (r["k"], r["v"]) for r in lake2.read().take_all()
    ) == got


def test_scan_range_zone_pruned_and_resurrection_safe(ray_session, tmp_path):
    """scan_range: zone maps skip the payload read of out-of-range
    files (files_narrow > 0), results equal read()+filter, and — the
    merge-on-read trap — a key whose NEWEST version lives in a pruned
    file must NOT resurrect its older in-range version."""
    import ray.data

    from jitsu_ray.sinks.lake import LakeTable

    lake = LakeTable.create(
        str(tmp_path / "lake"), ["k"], 4, stats_cols=["score"]
    )

    def win(lo, hi, rows):
        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "score": pa.array([r[1] for r in rows], pa.float64()),
                "payload": pa.array([r[2] for r in rows], pa.string()),
                "commit_seq": pa.array([r[3] for r in rows], pa.int64()),
                "op": pa.array(["upsert"] * len(rows), pa.string()),
            }
        )
        lake.apply_window(ray.data.from_arrow(t), lo, hi)

    # window 1: low scores (1, 2) incl. key 7 IN range
    win(0, 10, [(1, 10.0, "a", 1), (2, 20.0, "b", 2), (7, 15.0, "old7", 3)])
    # window 2: high scores only — key 7's NEWER version is out of range
    win(10, 20, [(3, 900.0, "c", 11), (7, 950.0, "new7", 12)])

    got = sorted(
        (r["k"], r["score"], r["payload"])
        for r in lake.scan_range("score", 0.0, 100.0).take_all()
    )
    # key 7 must be ABSENT: its latest score (950) is out of range, and
    # the old in-range row lost LWW — naive file skipping would leak it
    assert got == [(1, 10.0, "a"), (2, 20.0, "b")]
    st = lake.last_scan_stats
    assert st["files_narrow"] >= 1  # window-2 files were payload-skipped

    # ground truth: read() + residual filter gives the same rows
    full = sorted(
        (r["k"], r["score"], r["payload"])
        for r in lake.read().take_all()
        if r["score"] is not None and 0.0 <= r["score"] <= 100.0
    )
    assert got == full

    # the high band returns the other side, incl. key 7's latest
    hi_band = sorted(
        (r["k"], r["payload"])
        for r in lake.scan_range("score", 800.0, 1000.0).take_all()
    )
    assert hi_band == [(3, "c"), (7, "new7")]

    # column pruning keeps keys + requested col; empty no-overlap band
    slim = lake.scan_range("score", 0.0, 100.0, columns=["payload"]).take_all()
    assert sorted(r["k"] for r in slim) == [1, 2]
    assert lake.scan_range("score", 5000.0, 6000.0).count() == 0


# -- lake -> lake replication (pipelines/replicate) -------------------------


def _state(lake):
    """Visible replica-comparable state: key -> payload values (seqs
    are rewritten by replication, so they are excluded on purpose)."""
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
        for r in lake.read().take_all()
    }


def test_replica_incremental_tracks_source(ray_session, tmp_path):
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    # replica on a DIFFERENT partition count — layouts are independent
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)

    assert replicate(src, dst)["mode"] == "noop"  # both empty

    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "py", "v1"),
            ]
        ),
        0,
        2,
    )
    m1 = replicate(src, dst)
    assert m1["mode"] == "incremental" and m1["rows"] == 2
    assert _state(dst) == _state(src)

    # update a, tombstone b, insert c — all three change kinds propagate
    src.apply_window(
        make_ds(
            [
                ev(3, "update", "r1", "a", "c2", "py", "v2"),
                ev(4, "delete", "r1", "b"),
                ev(5, "insert", "r2", "c", "c1", "go", "v1"),
            ]
        ),
        2,
        5,
    )
    m2 = replicate(src, dst)
    assert m2["mode"] == "incremental"
    assert _state(dst) == _state(src)
    assert ("r1", "b") not in _state(dst)

    # idempotent: nothing new -> noop, state untouched
    before = _state(dst)
    assert replicate(src, dst)["mode"] == "noop"
    assert _state(dst) == before


def test_replica_resync_after_source_vacuum(ray_session, tmp_path):
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "py", "v1"),
            ]
        ),
        0,
        2,
    )
    assert replicate(src, dst)["mode"] == "incremental"

    src.apply_window(
        make_ds(
            [
                ev(3, "update", "r1", "a", "c2", "py", "v2"),
                ev(4, "delete", "r1", "b"),
                ev(5, "insert", "r2", "c", "c1", "go", "v1"),
            ]
        ),
        2,
        5,
    )
    # vacuum the history behind the replica watermark: the incremental
    # diff path is gone, replicate must fall back to a full re-sync
    src.compact(min_files=1, tombstone_watermark=4)
    m = replicate(src, dst)
    assert m["mode"] == "resync"
    assert _state(dst) == _state(src)
    # the deleted key was found by the anti join and tombstoned
    assert ("r1", "b") not in _state(dst)
    assert _state(dst)[("r1", "a")] == ("c2", "py", "v2")
    assert replicate(src, dst)["mode"] == "noop"


def test_diff_and_replica_across_source_split(ray_session, tmp_path):
    """A partition split between two CDC cutoffs must be invisible to
    diff_as_of: keys that merely moved to a child partition emit
    NOTHING (naive id-pairing would emit an equal-seq delete+insert
    pair — a nondeterministic LWW coin flip at the replica), while real
    updates/deletes still surface. Replication across the split stays
    incremental and converges."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    rows = [
        ev(i + 1, "insert", f"r{i % 7}", f"p{i}", "c", "py", f"v{i+1}")
        for i in range(30)
    ]
    src.apply_window(make_ds(rows), 0, 30)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    assert replicate(src, dst)["mode"] == "incremental"
    pre_split_hi = src.last_committed_hi()

    src.split_partition(0, factor=2)
    src.split_partition(1, factor=3)
    # pure topology change: the value-level diff across the splits is EMPTY
    assert src.diff_as_of(pre_split_hi, src.last_committed_hi()).count() == 0

    # real changes after the split still diff exactly
    src.apply_window(
        make_ds(
            [
                ev(31, "update", "r0", "p0", "c2", "py", "v31"),
                ev(32, "delete", "r1", "p1"),
                ev(33, "insert", "r9", "new", "c", "go", "w"),
            ]
        ),
        30, 33,
    )
    d = {
        (r["repo"], r["path"]): r["change"]
        for r in src.diff_as_of(pre_split_hi, 33).take_all()
    }
    assert d == {
        ("r0", "p0"): "update",
        ("r1", "p1"): "delete",
        ("r9", "new"): "insert",
    }
    m = replicate(src, dst)
    assert m["mode"] == "incremental"
    assert _state(dst) == _state(src)
    assert replicate(src, dst)["mode"] == "noop"


def test_replica_resync_after_deferred_vacuum(ray_session, tmp_path):
    """Deferred-GC variant of the vacuum race: compact(vacuum='defer')
    keeps the diff history alive (the round stays incremental), and
    only an explicit vacuum() behind the replica watermark degrades the
    next round to a full re-sync — retention as policy."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    assert replicate(src, dst)["mode"] == "incremental"
    src.apply_window(
        make_ds(
            [
                ev(2, "update", "r1", "a", "c2", "py", "v2"),
                ev(3, "insert", "r2", "b", "c1", "go", "w"),
            ]
        ),
        1, 3,
    )
    src.compact(min_files=1, vacuum="defer")
    # history intact: still an ordinary incremental round
    m = replicate(src, dst)
    assert m["mode"] == "incremental"
    assert _state(dst) == _state(src)
    # now vacuum history behind the watermark and change more state:
    # the diff path is gone, the round re-syncs and still converges
    src.apply_window(make_ds([ev(4, "delete", "r1", "a")]), 3, 4)
    src.compact(min_files=1, vacuum="defer")
    src.vacuum(keep_history=0)
    m = replicate(src, dst)
    assert m["mode"] == "resync"
    assert _state(dst) == _state(src)
    assert ("r1", "a") not in _state(dst)


def test_replica_rejects_nonreplication_writes(ray_session, tmp_path):
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1)
    replicate(src, dst)
    # a direct write squats seq territory ahead of the source
    dst.apply_window(make_ds([ev(50, "insert", "rX", "z", "c1", "py", "v")]), 1, 50)
    with pytest.raises(ValueError, match="AHEAD"):
        replicate(src, dst)

    # mismatched key columns are rejected up front
    other = LakeTable.create(str(tmp_path / "other"), ["repo"], 2)
    with pytest.raises(ValueError, match="key columns"):
        replicate(src, other)


def test_lww_equal_seq_tie_last_arrival_wins(ray_session, tmp_path):
    """The equal-seq tie rule: within one table the LAST row wins;
    across lake files the LATER-committed window wins — what makes a
    replication re-sync authoritative at the watermark seq."""
    from jitsu_ray.sinks.lake import resolve_keep_tombstones

    tbl = pa.table(
        {
            "commit_seq": pa.array([5, 5, 5], pa.int64()),
            "op": pa.array(["insert"] * 3, pa.string()),
            "repo": pa.array(["r1", "r1", "r2"], pa.string()),
            "path": pa.array(["a", "a", "b"], pa.string()),
            "commit": pa.array(["first", "second", "only"], pa.string()),
            "lang": pa.array(["py"] * 3, pa.string()),
            "content": pa.array(["v1", "v2", "x"], pa.large_string()),
        }
    )
    win = resolve_keep_tombstones(tbl, ["repo", "path"])
    got = {(r["repo"], r["path"]): r["commit"] for r in win.to_pylist()}
    assert got == {("r1", "a"): "second", ("r2", "b"): "only"}

    # lake-level: a later force-committed window at the SAME seq wins
    lake = LakeTable.create(str(tmp_path / "tie"), ["repo", "path"], 2)
    lake.apply_window(make_ds([ev(5, "insert", "r1", "a", "c1", "py", "old")]), 0, 5)
    lake.apply_window(
        make_ds([ev(5, "insert", "r1", "a", "c2", "py", "new")]), 3, 5, force=True
    )
    assert read_rows(lake)[("r1", "a")]["content"] == "new"


def test_replica_resyncs_after_late_spooled_window(ray_session, tmp_path):
    """A source window force-committed at its ORIGINAL lower bounds
    (the replay_spooled recovery path) AFTER the replica advanced past
    them is invisible to every incremental diff — replicate must detect
    it via the recorded ledger position and fall back to a re-sync."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    # stream advanced to hi=20 with a hole: window (10, 12] spooled
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 10)
    src.apply_window(make_ds([ev(20, "insert", "r1", "b", "c1", "py", "v1")]), 12, 20)
    assert replicate(src, dst)["mode"] == "incremental"
    assert _state(dst) == _state(src)

    # spool recovery: the held-back window force-applies at (10, 12]
    src.apply_window(
        make_ds([ev(12, "insert", "r9", "late", "c1", "go", "vL")]),
        10,
        12,
        force=True,
    )
    assert src.ledger.last_committed_hi() == 20  # watermark unmoved
    m = replicate(src, dst)
    assert m["mode"] == "resync"
    assert ("r9", "late") in _state(dst)
    assert _state(dst) == _state(src)
    # back to steady state afterwards
    assert replicate(src, dst)["mode"] == "noop"
    src.apply_window(make_ds([ev(21, "insert", "r1", "c", "c1", "py", "v")]), 20, 21)
    assert replicate(src, dst)["mode"] == "incremental"
    assert _state(dst) == _state(src)


def test_replica_foreign_write_detected_and_healed(ray_session, tmp_path):
    """A direct write to the replica whose hi lands AT-OR-BELOW the
    source's hi (so the old AHEAD check cannot see it) is detected via
    the missing replication tag; resync=True heals from source state."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 2)
    src.apply_window(make_ds([ev(4, "insert", "r1", "b", "c1", "py", "v1")]), 2, 5)
    assert replicate(src, dst)["mode"] == "incremental"

    # foreign write: squats (2, 4] inside the source's committed range
    # and plants a stray row — silently skippable without the tag check
    dst.apply_window(
        make_ds([ev(4, "insert", "rX", "stray", "c1", "py", "v")]), 2, 4, force=True
    )
    src.apply_window(make_ds([ev(6, "update", "r1", "a", "c2", "py", "v2")]), 5, 6)
    with pytest.raises(ValueError, match="resync=True"):
        replicate(src, dst)
    m = replicate(src, dst, resync=True)
    assert m["mode"] == "resync"
    assert ("rX", "stray") not in _state(dst)  # stray row tombstoned
    assert _state(dst) == _state(src)
    assert _state(dst)[("r1", "a")] == ("c2", "py", "v2")
    # the heal tag resets the scan floor: rounds resume incrementally
    src.apply_window(make_ds([ev(7, "insert", "r2", "c", "c1", "go", "v")]), 6, 7)
    assert replicate(src, dst)["mode"] == "incremental"
    assert _state(dst) == _state(src)


def test_replica_resync_null_safe_anti_join(ray_session, tmp_path):
    """A null-keyed row present in BOTH lakes must survive a re-sync
    unchanged: Arrow join semantics never match null keys, so without
    the null-safe helper keys the anti join would tombstone it at the
    same seq as its re-insert (a nondeterministic LWW tie)."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", None, "orphan", "c1", "py", "vN"),
                ev(2, "insert", "r1", "a", "c1", "py", "v1"),
            ]
        ),
        0,
        2,
    )
    assert replicate(src, dst)["mode"] == "incremental"
    # force re-syncs repeatedly: the null-keyed row must never flicker
    for _ in range(3):
        m = replicate(src, dst, resync=True)
        assert m["mode"] == "resync"
        assert _state(dst) == _state(src)
        assert (None, "orphan") in _state(dst)
    # a null-keyed row the source DROPPED is still tombstoned by resync
    src.apply_window(make_ds([ev(3, "delete", None, "orphan")]), 2, 3)
    assert replicate(src, dst)["mode"] == "incremental"
    assert (None, "orphan") not in _state(dst)
    assert replicate(src, dst, resync=True)["mode"] == "resync"
    assert _state(dst) == _state(src)


def test_replica_lazy_vacuum_race_degrades_to_resync(ray_session, tmp_path, monkeypatch):
    """diff_as_of passes its EAGER existence check, then the source
    files vanish while the lazy window streams (a compact racing the
    apply): apply_window must discard its partially-fed merger pool
    (no leaked rows) and replicate must degrade to a re-sync."""
    import ray.data

    from jitsu_ray.pipelines import replicate as rep_mod
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1)
    assert replicate(src, dst)["mode"] == "incremental"
    src.apply_window(make_ds([ev(2, "insert", "r1", "b", "c1", "py", "v2")]), 1, 2)

    real = rep_mod._incremental_delta

    def poisoned(src_, dst_, frm, to, *args, **kw):
        ds = real(src_, dst_, frm, to, *args, **kw)

        def leak_then_raise(batch):
            # first feed the exchange a row that must NOT survive the
            # failed window, then fail like a mid-stream vacuumed read
            if batch.num_rows and batch["path"][0].as_py() == "LEAK":
                raise FileNotFoundError("simulated vacuumed file")
            return batch

        leak = make_ds([ev(2, "insert", "rL", "LEAK-marker", "c", "py", "x")])
        poison = make_ds([ev(2, "insert", "rL", "LEAK", "c", "py", "x")])
        return ds.union(leak, poison).map_batches(
            leak_then_raise, batch_format="pyarrow"
        )

    monkeypatch.setattr(rep_mod, "_incremental_delta", poisoned)
    m = replicate(src, dst)
    monkeypatch.undo()
    assert m["mode"] == "resync"
    state = _state(dst)
    assert state == _state(src)
    assert ("rL", "LEAK-marker") not in state  # failed window fully discarded
    assert replicate(src, dst)["mode"] == "noop"


def test_replica_resyncs_on_swapped_source(ray_session, tmp_path):
    """Pointing an existing replica at a DIFFERENT source lake (whose
    hi happens to be >= the watermark, so the AHEAD check passes) must
    re-sync: ledger positions recorded against the old source's ledger
    are meaningless for the new one."""
    from jitsu_ray.pipelines.replicate import replicate

    src1 = LakeTable.create(str(tmp_path / "src1"), ["repo", "path"], 2)
    src2 = LakeTable.create(str(tmp_path / "src2"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src1.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 2)
    src2.apply_window(make_ds([ev(2, "insert", "r2", "b", "c1", "go", "vX")]), 0, 3)
    assert replicate(src1, dst)["mode"] == "incremental"
    m = replicate(src2, dst)
    assert m["mode"] == "resync"
    assert _state(dst) == _state(src2)
    assert ("r1", "a") not in _state(dst)
    assert replicate(src2, dst)["mode"] == "noop"  # identity re-pinned


def test_replica_resyncs_on_recreated_source(ray_session, tmp_path):
    """A source lake DELETED AND RECREATED AT THE SAME PATH must be
    detected: realpath identity matches and the fresh ledger's seqs can
    tie the recorded position exactly, so without the creation-UUID
    check every round noops while the replica silently diverges."""
    import shutil

    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "py", "v1"),
            ]
        ),
        0,
        10,
    )
    assert replicate(src, dst)["mode"] == "incremental"

    # recreate the source in place with DIFFERENT content, committed at
    # the exact same hi (frm == to) and an equal-length ledger
    shutil.rmtree(str(tmp_path / "src"))
    src2 = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src2.apply_window(make_ds([ev(3, "insert", "r2", "c", "c1", "go", "vX")]), 0, 10)

    m = replicate(src2, dst)
    assert m["mode"] == "resync"
    assert _state(dst) == _state(src2)
    assert ("r1", "a") not in _state(dst)  # old keys tombstoned
    assert ("r2", "c") in _state(dst)
    assert replicate(src2, dst)["mode"] == "noop"  # new identity pinned


def test_replica_resync_helper_key_name_collision(ray_session, tmp_path):
    """A lake whose key column is literally named __nsk0 must not have
    it clobbered by the null-safe helper projection: an unguarded name
    would overwrite the key with its fill_null('') cast on the anti
    join's left side and tombstone '' instead of NULL."""
    import ray.data

    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["__nsk0", "__nsn0"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["__nsk0", "__nsn0"], 2)

    def win(rows, lo, hi):
        t = pa.table(
            {
                "commit_seq": pa.array([r[0] for r in rows], pa.int64()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "__nsk0": pa.array([r[2] for r in rows], pa.string()),
                "__nsn0": pa.array([r[3] for r in rows], pa.string()),
                "val": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        src.apply_window(ray.data.from_arrow(t), lo, hi)

    # a null-keyed row present in both lakes plus a real ''-keyed row:
    # with the helper collision the resync would conflate the two
    win([(1, "insert", None, "n", "null-row"), (2, "insert", "", "e", "empty-row")], 0, 2)
    assert replicate(src, dst)["mode"] == "incremental"

    def state(lake):
        return {
            (r["__nsk0"], r["__nsn0"]): r["val"] for r in lake.read().take_all()
        }

    for _ in range(2):
        assert replicate(src, dst, resync=True)["mode"] == "resync"
        assert state(dst) == state(src)
        assert (None, "n") in state(dst) and ("", "e") in state(dst)
    # dropping the null-keyed row still tombstones exactly that row
    win([(3, "delete", None, "n", None)], 2, 3)
    replicate(src, dst)
    assert replicate(src, dst, resync=True)["mode"] == "resync"
    assert state(dst) == state(src)
    assert (None, "n") not in state(dst) and ("", "e") in state(dst)


@pytest.mark.usefixtures("ray_session")
def test_tiered_compaction_bounded_and_deferred(ray_session, tmp_path):
    """Size-tiered compaction: with max_input_bytes each fold reads a
    byte-bounded CONSECUTIVE run, state is unchanged, repeated passes
    converge toward one base, and vacuum='defer' keeps replaced files
    on disk so older time travel still works until vacuum()."""
    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 2)
    for w in range(6):
        lake.apply_window(
            make_ds(
                [
                    ev(2 * w + 1, "insert", "r1", f"p{w}", f"c{w}", "py", f"v{2*w+1}"),
                    ev(2 * w + 2, "update", "r1", "hot", f"c{w}", "py", f"v{2*w+2}"),
                ]
            ),
            2 * w,
            2 * w + 2,
        )
    before = _state(lake)
    n_before = sum(len(fs) for fs in lake.live_files().values())
    # tiny budget: every pair of small files folds, several tiers per part
    entry = lake.compact(max_input_bytes=20_000, vacuum="defer")
    assert _state(lake) == before
    n_after = sum(len(fs) for fs in lake.live_files().values())
    assert n_after < n_before
    # deferred GC: every replaced file is still on disk, so time travel
    # to the FIRST window still resolves
    replaced = [
        f
        for info in entry["parts"].values()
        for one in (info if isinstance(info, list) else [info])
        for f in one["replaces"]
    ]
    assert replaced and all(
        os.path.exists(os.path.join(lake.dir, f)) for f in replaced
    )
    early = lake.read(as_of=2).take_all()
    assert {(r["repo"], r["path"]) for r in early} == {("r1", "p0"), ("r1", "hot")}
    # repeated tiered passes converge without changing state
    for _ in range(3):
        lake.compact(max_input_bytes=20_000, vacuum="defer")
    assert _state(lake) == before
    # equal-seq tie order survives a PREFIX fold: force-commit a
    # same-seq rewrite (later arrival wins), tier-compact only the old
    # prefix, and the late row must still win
    top = max(r[2] for r in ((0, 0, int(v[2][1:])) for v in before.values()))
    lake.apply_window(
        make_ds([ev(top, "insert", "r1", "hot", "cz", "py", f"v{top}-late")]),
        0, 1, force=True,
    )
    assert _state(lake)[("r1", "hot")][2] == f"v{top}-late"
    lake.compact(max_input_bytes=20_000, vacuum="defer")
    assert _state(lake)[("r1", "hot")][2] == f"v{top}-late"


def test_partition_split_routes_and_preserves_state(ray_session, tmp_path):
    """Ledger-recorded partition split: state and time travel are
    unchanged, new windows route to the children, lookup prunes to the
    refined partition, and vacuum() GCs the parent files afterward
    (pre-split time travel then raises the precise vacuum error)."""
    import pytest

    from jitsu_ray.sinks.lake import active_moduli

    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 2)
    rows = [
        ev(i + 1, "insert", f"r{i % 5}", f"p{i}", "c", "py", f"v{i+1}")
        for i in range(40)
    ]
    lake.apply_window(make_ds(rows[:20]), 0, 20)
    lake.apply_window(make_ds(rows[20:]), 20, 40)
    before = _state(lake)
    entry = lake.split_partition(0, factor=2)
    assert entry["children"] == [0, 2]
    assert sorted(active_moduli(2, lake.ledger.splits())) == [0, 1, 2]
    assert active_moduli(2, lake.ledger.splits()) == {0: 4, 1: 2, 2: 4}
    assert _state(lake) == before  # split is pure routing
    # pre-split time travel still works (parent files deferred)
    assert len(lake.read(as_of=20).take_all()) == 20
    # a new window routes to the refined topology: no file may land in
    # a parent that is no longer active
    lake.apply_window(
        make_ds([ev(41 + i, "insert", f"r{i}", f"q{i}", "c", "py", "w") for i in range(8)]),
        40, 48,
    )
    live = lake.live_files()
    assert set(live) <= {0, 1, 2}
    assert _state(lake)[("r0", "q0")] == ("c", "py", "w")
    # lookup routes through the refinement and touches ONE partition
    hit = lake.lookup([{"repo": "r0", "path": "q0"}])
    assert hit.num_rows == 1 and lake.last_lookup_stats["partitions_read"] == 1
    # split a CHILD again (nested refinement)
    lake.split_partition(2, factor=2)
    assert _state(lake)[("r0", "q0")] == ("c", "py", "w")
    assert lake.lookup([{"repo": "r1", "path": "p1"}]).num_rows == 1
    # vacuum removes the replaced parent files; pre-split as_of now
    # raises the precise vacuum-row error
    out = lake.vacuum(keep_history=0)
    assert out["removed"]
    with pytest.raises(FileNotFoundError, match="vacuum ledger row"):
        lake.read(as_of=20).take_all()
    assert _state(lake) == {**before, **{(f"r{i}", f"q{i}"): ("c", "py", "w") for i in range(8)}}


def test_maintain_policy_pass(ray_session, tmp_path):
    """maintain(): one pass auto-splits partitions over the byte
    budget (factor sized to land children near the budget),
    tier-compacts with deferred GC, and vacuums on the retention
    window — state invariant throughout, new windows route to the
    refined topology."""
    from jitsu_ray.sinks.lake import active_moduli

    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 2)
    # bulk of the data on partition-heavy keys so at least one partition
    # exceeds the small budget
    rows = [
        ev(i + 1, "insert", f"r{i % 3}", f"p{i}", "c", "py", "x" * 500)
        for i in range(200)
    ]
    lake.apply_window(make_ds(rows[:100]), 0, 100)
    lake.apply_window(make_ds(rows[100:]), 100, 200)
    before = _state(lake)
    sizes = {
        p: sum(os.path.getsize(f) for f in fs)
        for p, fs in lake.live_files().items()
    }
    budget = max(sizes.values()) // 2  # forces at least one split
    out = lake.maintain(
        max_partition_bytes=budget, min_files=2, keep_history=0
    )
    assert out["splits"], "expected at least one auto-split"
    assert _state(lake) == before
    # the split factor targeted the budget: every child's live bytes
    # should be well under the parent's old size (hash spread, not exact)
    act = active_moduli(2, lake.ledger.splits())
    assert len(act) > 2
    # follow-up windows still land correctly
    lake.apply_window(
        make_ds([ev(201, "insert", "rz", "new", "c", "go", "w")]), 200, 201
    )
    assert _state(lake)[("rz", "new")] == ("c", "go", "w")
    # idempotent-ish second pass: no state change
    lake.maintain(max_partition_bytes=budget, min_files=2, keep_history=0)
    assert _state(lake)[("r0", "p0")] == before[("r0", "p0")]


def test_clustered_compaction_prunes_range_scans(ray_session, tmp_path):
    """compact(cluster_by=...): the fold is sorted by the clustering
    column and cut into range-disjoint chunk files, so a narrow
    scan_range band prunes most files via the ledger zone maps —
    before clustering every file spans the whole domain and nothing
    prunes. State and band results are unchanged."""
    import random

    rnd = random.Random(7)
    lake = LakeTable.create(
        str(tmp_path / "lake"), ["repo", "path"], 1, stats_cols=["commit"]
    )
    # 'commit' doubles as the scan column: random 0..9999 as strings of
    # fixed width so lexicographic order == numeric order
    rows = [
        ev(i + 1, "insert", "r", f"p{i}", f"{rnd.randrange(10000):05d}",
           "py", "x" * 200)
        for i in range(600)
    ]
    lake.apply_window(make_ds(rows[:300]), 0, 300)
    lake.apply_window(make_ds(rows[300:]), 300, 600)
    before = {r["path"]: r["commit"] for r in lake.read().take_all()}

    def band_paths():
        out = lake.scan_range("commit", "02000", "02999").take_all()
        return {r["path"]: r["commit"] for r in out}

    unclustered = band_paths()
    st = dict(lake.last_scan_stats)
    assert st["files_full"] == st["files_total"]  # random order: no pruning

    lake.compact(cluster_by=["commit"], max_input_bytes=40_000, vacuum="defer")
    assert {r["path"]: r["commit"] for r in lake.read().take_all()} == before
    assert band_paths() == unclustered
    st2 = dict(lake.last_scan_stats)
    assert st2["files_total"] > 2  # the fold really chunked
    assert st2["files_full"] < st2["files_total"]  # and the band prunes


def test_clustered_chunks_preserve_tie_order(ray_session, tmp_path):
    """Clustered-compaction chunk files j >= 1 anchor to their
    predecessor in the ledger replay (insert_after): a key repaired at
    an EQUAL seq by a later forced window must keep the repair value
    even when the old version lands in a chunk that, naively appended,
    would replay AFTER the repair file and win the last-arrival tie."""
    lake = LakeTable.create(
        str(tmp_path / "lake"), ["repo", "path"], 1, stats_cols=["commit"]
    )
    # pX gets the LARGEST clustering value so it sorts into the LAST chunk
    rows = [
        ev(i + 1, "insert", "r", f"p{i:03d}", f"{i:05d}", "py", "x" * 200)
        for i in range(200)
    ]
    rows[100] = ev(101, "insert", "r", "pX", "99999", "py", "v-old")
    lake.apply_window(make_ds(rows[:100]), 0, 100)
    lake.apply_window(make_ds(rows[100:]), 100, 200)
    # forced same-seq repair: last arrival wins the tie
    lake.apply_window(
        make_ds([ev(101, "insert", "r", "pX", "99999", "py", "v-new")]),
        0, 1, force=True,
    )
    assert _state(lake)[("r", "pX")][2] == "v-new"
    # budget sized so the two NORMAL windows (holding pX v-old) fold in
    # one CHUNKED tier while the forced repair file stays its own
    # single-file tier AFTER them in ledger order — the hazard shape
    entry = lake.compact(
        cluster_by=["commit"], max_input_bytes=11_000, vacuum="defer"
    )
    [infos] = entry["parts"].values()
    assert isinstance(infos, list) and len(infos) >= 2  # fold chunked
    assert len(infos[0]["replaces"]) == 2  # ...and folded ONLY w1+w2
    assert all(i.get("insert_after") for i in infos[1:])
    assert _state(lake)[("r", "pX")][2] == "v-new"
    # the anchor is LOAD-BEARING: strip insert_after from the committed
    # row and the replay appends late chunks after the repair file,
    # flipping the equal-seq tie back to v-old (the bug this fixes)
    import glob as _glob
    import json as _json

    rows_by_kind = {}
    for p in _glob.glob(os.path.join(lake.dir, "_ledger", "*.json")):
        rows_by_kind.setdefault(_json.load(open(p))["kind"], []).append(p)
    [row_path] = rows_by_kind["compact"]
    # compact() auto-checkpoints, and the checkpoint froze the correct
    # file order — drop it so the strip below actually replays the row
    for ck in rows_by_kind.get("checkpoint", []):
        os.unlink(ck)
    raw = _json.load(open(row_path))
    stripped = _json.loads(_json.dumps(raw))
    for i in list(stripped["parts"].values())[0]:
        i.pop("insert_after", None)
    _json.dump(stripped, open(row_path, "w"))
    assert _state(lake)[("r", "pX")][2] == "v-old"  # bug reproduced
    _json.dump(raw, open(row_path, "w"))  # restore
    assert _state(lake)[("r", "pX")][2] == "v-new"
    # and the whole state survives a fresh checkpoint fold
    lake.ledger.checkpoint()
    assert _state(lake)[("r", "pX")][2] == "v-new"
    assert len(_state(lake)) == 200


def test_vacuum_retention_grace_window(ray_session, tmp_path):
    """vacuum(keep_history=N): files replaced by recent folds survive
    the grace window (old as_of keeps working); shrinking the window
    removes them and the error names the vacuum ledger row. A crash
    between the vacuum row and the unlink is swept by the next pass."""
    import pytest

    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 2)
    for w in range(3):
        lake.apply_window(
            make_ds([ev(w + 1, "insert", "r", f"p{w}", "c", "py", f"v{w+1}")]),
            w, w + 1,
        )
    lake.compact(vacuum="defer")
    # generous grace window: nothing removable yet
    assert lake.vacuum(keep_history=100)["removed"] == []
    assert len(lake.read(as_of=1).take_all()) == 1
    # zero grace: deltas replaced by the compaction go away
    out = lake.vacuum(keep_history=0)
    assert out["removed"]
    with pytest.raises(FileNotFoundError, match="vacuum ledger row"):
        lake.read(as_of=1).take_all()
    # current state unaffected
    assert len(lake.read().take_all()) == 3


def test_lake_random_interleaving_matches_oracle(ray_session, tmp_path):
    """Property for the CORE lake: under any interleaving of normal
    windows, late force-committed windows (old bounds, old/tied seqs),
    tombstone-retaining compactions (whole-partition AND size-tiered
    deferred-GC), ledger checkpoints, PARTITION SPLITS and vacuum
    retention passes, the resolved state always equals a pure-Python
    LWW fold with the lake's tie rule (higher commit_seq wins; equal
    seqs -> later-arrived row wins), lookup routes every key to its
    refined partition, and time travel at any committed hi equals the
    fold over the bounded ledger replay — including the TOPOLOGY BREAK
    rule (a split after the first excluded window ends the bounded
    view) — or raises FileNotFoundError once GC took that history away
    (immediate compaction or vacuum; the lakehouse contract)."""
    import uuid as _uuid

    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from jitsu_ray.sinks.lake import active_moduli

    keys = [(None, "n"), ("r1", "a"), ("r1", "b"), ("r2", "c")]

    def fold(evlist):
        """{key: winning seq} over (seq, op, key) in arrival order —
        winner is max (seq, arrival), deletes drop the key."""
        best = {}
        for arrival, (s, op, k) in enumerate(evlist):
            cur = best.get(k)
            if cur is None or (s, arrival) >= (cur[0], cur[1]):
                best[k] = (s, arrival, op)
        return {k: v[0] for k, v in best.items() if v[2] != "delete"}

    @settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
    @given(st.data())
    def run(data):
        lake = LakeTable.create(
            str(tmp_path / _uuid.uuid4().hex), ["repo", "path"], 3
        )
        events: list = []  # (seq, op, key) in arrival order
        ledger_log: list = []  # ("window", hi, [event idx]) | ("split",)
        seq = hi = 0
        lossy = False  # immediate compact / vacuum may drop history
        for _ in range(data.draw(st.integers(3, 7))):
            act = data.draw(
                st.sampled_from(
                    ["window", "window", "late", "compact", "tiered",
                     "split", "vacuum", "ckpt"]
                )
            )
            if act == "compact":
                lake.compact(min_files=1, tombstone_watermark=0)
                lossy = True
            elif act == "tiered":
                lake.compact(
                    min_files=2,
                    max_input_bytes=data.draw(st.sampled_from([1, 20_000])),
                    vacuum="defer",
                )
            elif act == "split":
                parts = sorted(active_moduli(3, lake.ledger.splits()))
                lake.split_partition(
                    data.draw(st.sampled_from(parts)),
                    factor=data.draw(st.sampled_from([2, 3])),
                )
                ledger_log.append(("split", None, None))
            elif act == "vacuum":
                lake.vacuum(keep_history=data.draw(st.integers(0, 4)))
                lossy = True
            elif act == "ckpt":
                lake.ledger.checkpoint()
            elif act == "late" and hi >= 2:
                lo2 = data.draw(st.integers(0, hi - 1))
                hi2 = data.draw(st.integers(lo2 + 1, hi))
                rows, idxs = [], []
                for _ in range(data.draw(st.integers(1, 3))):
                    s = data.draw(st.integers(1, hi2))
                    k = data.draw(st.sampled_from(keys))
                    op = data.draw(st.sampled_from(["insert", "delete"]))
                    rows.append(ev(s, op, k[0], k[1], "c", "py", f"v{s}"))
                    idxs.append(len(events))
                    events.append((s, op, k))
                lake.apply_window(make_ds(rows), lo2, hi2, force=True)
                ledger_log.append(("window", hi2, idxs))
            else:
                rows, idxs = [], []
                for _ in range(data.draw(st.integers(1, 3))):
                    seq += 1
                    k = data.draw(st.sampled_from(keys))
                    op = data.draw(st.sampled_from(["insert", "update", "delete"]))
                    rows.append(ev(seq, op, k[0], k[1], "c", "py", f"v{seq}"))
                    idxs.append(len(events))
                    events.append((seq, op, k))
                lo, hi = hi, seq
                lake.apply_window(make_ds(rows), lo, hi)
                ledger_log.append(("window", hi, idxs))
            # content is f"v{seq}", so the winning seq pins the winning ROW
            assert {
                k: int(v[2][1:]) for k, v in _state(lake).items()
            } == fold(events)
        # point lookups route through whatever topology the splits left
        expect = fold(events)
        got = {
            (r["repo"], r["path"]): r["commit_seq"]
            for r in lake.lookup(
                [{"repo": k[0], "path": k[1]} for k in keys]
            ).to_pylist()
        }
        assert got == expect
        # time travel at every committed window hi, modeling the bounded
        # replay exactly: windows above the bound are skipped, and the
        # first split after any skipped window freezes the view
        for bound in sorted(
            {h for kind, h, _ in ledger_log if kind == "window"}
        ):
            included, skipped = [], False
            for kind, h, idxs in ledger_log:
                if kind == "window":
                    if h > bound:
                        skipped = True
                        continue
                    included.extend(idxs)
                elif kind == "split" and skipped:
                    break
            try:
                got = {
                    (r["repo"], r["path"]): int(r["content"][1:])
                    for r in lake.read(as_of=bound).take_all()
                }
            except FileNotFoundError:
                assert lossy  # only GC may take history away
                continue
            assert got == fold([events[i] for i in included])

    run()


def test_replica_resync_on_empty_lakes(ray_session, tmp_path):
    """Forced re-sync of an EMPTY source (and/or empty replica) must
    commit cleanly instead of crashing on a schema-less zero-block
    Dataset — found by the interleaving property test below."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    # both empty: the tagged (0, 0] repair window commits, state stays {}
    assert replicate(src, dst, resync=True)["mode"] == "resync"
    assert _state(dst) == _state(src) == {}
    # data arriving later still replicates incrementally
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1)
    assert replicate(src, dst)["mode"] == "incremental"
    assert _state(dst) == _state(src)
    # source emptied again (tombstoned + vacuumed): re-sync tombstones
    # the replica's rows even with zero live source files
    src.apply_window(make_ds([ev(2, "delete", "r1", "a")]), 1, 2)
    src.compact(min_files=1, tombstone_watermark=5)
    assert replicate(src, dst, resync=True)["mode"] == "resync"
    assert _state(dst) == _state(src) == {}


@pytest.mark.usefixtures("ray_session")
def test_replica_random_interleaving_matches_source(ray_session, tmp_path):
    """Property: under ANY interleaving of source windows (including
    late force-committed ones at old bounds), replicate() calls and
    forced re-syncs, the replica's resolved state equals the source's
    after every round — the one invariant all the scenario tests above
    are instances of. Uses hypothesis' data() draw per action."""
    import uuid as _uuid

    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from jitsu_ray.pipelines.replicate import replicate

    from jitsu_ray.sinks.lake import active_moduli

    keys = [(None, "n"), ("r1", "a"), ("r1", "b"), ("r2", "c")]
    acts = ["window", "window", "late", "replicate", "resync", "split", "vacuum"]

    @settings(deadline=None, max_examples=6, suppress_health_check=list(HealthCheck))
    @given(st.data())
    def run(data):
        base = tmp_path / _uuid.uuid4().hex
        src = LakeTable.create(str(base / "src"), ["repo", "path"], 3)
        dst = LakeTable.create(str(base / "dst"), ["repo", "path"], 2)
        seq = hi = 0
        for _ in range(data.draw(st.integers(3, 6))):
            act = data.draw(st.sampled_from(acts))
            if act == "split":
                # round 5: SOURCE partition splits between rounds must be
                # invisible to replication (topology-aware diff pairing)
                parts = sorted(active_moduli(3, src.ledger.splits()))
                src.split_partition(
                    data.draw(st.sampled_from(parts)),
                    factor=data.draw(st.sampled_from([2, 3])),
                )
                continue
            if act == "vacuum":
                # deferred-GC fold then retention: an incremental round
                # whose diff history was vacuumed must degrade to resync
                # (and still converge), never diverge or crash
                src.compact(min_files=1, tombstone_watermark=0, vacuum="defer")
                src.vacuum(keep_history=data.draw(st.integers(0, 3)))
                continue
            if act in ("window", "late"):
                if act == "late" and hi < 2:
                    act = "window"
                rows = []
                for _ in range(data.draw(st.integers(1, 3))):
                    k = data.draw(st.sampled_from(keys))
                    op = data.draw(st.sampled_from(["insert", "update", "delete"]))
                    if act == "late":
                        s = data.draw(st.integers(1, hi))  # old-range seq,
                        # ties against committed rows legal (LWW tie rule)
                    else:
                        seq += 1
                        s = seq
                    rows.append(ev(s, op, k[0], k[1], "c", "py", f"v{s}"))
                if act == "late":
                    lo2 = data.draw(st.integers(0, hi - 1))
                    src.apply_window(
                        make_ds(rows), lo2, data.draw(st.integers(lo2 + 1, hi)),
                        force=True,
                    )
                else:
                    lo, hi = hi, max(seq, hi + 1)
                    src.apply_window(make_ds(rows), lo, hi)
                    seq = hi
            else:
                replicate(src, dst, resync=(act == "resync"))
                assert _state(dst) == _state(src)
        replicate(src, dst)
        assert _state(dst) == _state(src)
        assert replicate(src, dst)["mode"] == "noop"

    run()


def test_replica_chain_cascades(ray_session, tmp_path):
    """Cascading replicas (src -> mid -> leaf): a mid replica is a
    legal SOURCE for a further replica, and a late spool-recovered
    window on the root cascades as resync -> incremental down the
    chain."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    mid = LakeTable.create(str(tmp_path / "mid"), ["repo", "path"], 2)
    leaf = LakeTable.create(str(tmp_path / "leaf"), ["repo", "path"], 3)
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 10)
    src.apply_window(make_ds([ev(20, "insert", "r1", "b", "c1", "py", "v1")]), 12, 20)
    assert replicate(src, mid)["mode"] == "incremental"
    assert replicate(mid, leaf)["mode"] == "incremental"
    assert _state(leaf) == _state(src)

    # root recovery: late force-commit below the watermark
    src.apply_window(
        make_ds([ev(12, "insert", "r9", "late", "c1", "go", "vL")]), 10, 12, force=True
    )
    assert replicate(src, mid)["mode"] == "resync"
    # mid's repair commits at (frm == to], advancing NOTHING — but it
    # is a NEW mid ledger row, so the leaf round sees a late window
    # and repairs itself the same way
    m = replicate(mid, leaf)
    assert m["mode"] == "resync"
    assert _state(leaf) == _state(mid) == _state(src)
    assert ("r9", "late") in _state(leaf)
    # steady state resumes down the chain
    src.apply_window(make_ds([ev(21, "insert", "r2", "c", "c1", "py", "v")]), 20, 21)
    assert replicate(src, mid)["mode"] == "incremental"
    assert replicate(mid, leaf)["mode"] == "incremental"
    assert _state(leaf) == _state(src)


def test_replica_incremental_preserves_null_key_row(ray_session, tmp_path):
    """A null-keyed row unchanged in BOTH as-of states must survive an
    incremental round: without nulls_equal on diff_as_of's full join it
    splits into a same-seq delete+insert pair and the last-arrival tie
    rule can let the tombstone win — silent, undetectable divergence."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", None, "orphan", "c1", "py", "vN"),
                ev(2, "insert", "r1", "a", "c1", "py", "v1"),
            ]
        ),
        0,
        2,
    )
    assert replicate(src, dst)["mode"] == "incremental"
    assert (None, "orphan") in _state(dst)
    # unrelated source windows: the null row is in both diff states
    for i in range(3, 6):
        src.apply_window(
            make_ds([ev(i, "insert", "r1", f"p{i}", "c", "py", "v")]), i - 1, i
        )
        assert replicate(src, dst)["mode"] == "incremental"
        assert (None, "orphan") in _state(dst)
        assert _state(dst) == _state(src)


def test_replica_unhealable_high_seq_stray_raises(ray_session, tmp_path):
    """A foreign write may legally carry ROW seqs above its own window
    hi (out-of-order delivery contract); above the SOURCE's committed
    hi such rows beat every LWW repair stamped at the watermark, so
    resync=True must refuse loudly instead of reporting a heal that
    silently left the stray alive."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    src.apply_window(make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 2)
    src.apply_window(make_ds([ev(4, "insert", "r1", "b", "c1", "py", "v1")]), 2, 6)
    assert replicate(src, dst)["mode"] == "incremental"

    # foreign window (2, 4] planting a row at commit_seq=100 > src hi 6
    dst.apply_window(
        make_ds([ev(100, "insert", "rX", "stray", "c1", "py", "v")]), 2, 4, force=True
    )
    assert dst.max_row_seq() == 100
    with pytest.raises(ValueError, match="resync=True"):
        replicate(src, dst)
    with pytest.raises(ValueError, match="recreate"):
        replicate(src, dst, resync=True)
    # a stray DELETE above hi is equally unhealable (its tombstone
    # would eat every future re-insert of that key) — same refusal
    dst2 = LakeTable.create(str(tmp_path / "dst2"), ["repo", "path"], 2)
    assert replicate(src, dst2)["mode"] == "incremental"
    dst2.apply_window(make_ds([ev(50, "delete", "r1", "a")]), 2, 4, force=True)
    with pytest.raises(ValueError, match="recreate"):
        replicate(src, dst2, resync=True)


def test_resolve_tie_path_survives_pos_column_collision(ray_session):
    """resolve_keep_tombstones' exact-resolution path (reachable when a
    null key and an empty-string key share a batch — they hash equal)
    must not clobber a payload column literally named __pos."""
    from jitsu_ray.sinks.lake import resolve_keep_tombstones

    tbl = pa.table(
        {
            "commit_seq": pa.array([1, 2], pa.int64()),
            "op": pa.array(["insert", "insert"], pa.string()),
            "repo": pa.array([None, ""], pa.string()),
            "path": pa.array(["x", "x"], pa.string()),
            "__pos": pa.array(["keep-null", "keep-empty"], pa.string()),
        }
    )
    win = resolve_keep_tombstones(tbl, ["repo", "path"])
    got = {(r["repo"], r["path"]): r["__pos"] for r in win.to_pylist()}
    assert got == {(None, "x"): "keep-null", ("", "x"): "keep-empty"}


def test_lookup_null_key_round_trip(ray_session, tmp_path):
    """A NULL key component routes into partitions/blooms via
    fill_null('') like any value, so lookup must return it — and must
    NOT conflate it with the empty-string key that shares its hash."""
    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 4)
    lake.apply_window(
        make_ds(
            [
                ev(1, "insert", None, "x", "cN", "py", "null-key"),
                ev(2, "insert", "", "x", "cE", "py", "empty-key"),
                ev(3, "insert", "r1", "x", "c1", "py", "plain"),
            ]
        ),
        0,
        3,
    )
    hit = lake.lookup([{"repo": None, "path": "x"}])
    assert hit.num_rows == 1 and hit["content"][0].as_py() == "null-key"
    hit = lake.lookup([{"repo": "", "path": "x"}])
    assert hit.num_rows == 1 and hit["content"][0].as_py() == "empty-key"
    hit = lake.lookup([{"repo": None, "path": "x"}, {"repo": "r1", "path": "x"}])
    assert sorted(hit["content"].to_pylist()) == ["null-key", "plain"]


def _proj_state(lake, cols):
    """Key -> the given payload column values (for partial replicas whose
    payload is a subset)."""
    return {
        (r["repo"], r["path"]): tuple(r[c] for c in cols)
        for r in lake.read().take_all()
    }


def test_replica_filtered_tracks_source(ray_session, tmp_path):
    """Partial replica: where= references a payload column that is NOT
    in columns= (the filter-column/projection split); rows entering and
    leaving the predicate propagate as insert/delete."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    WHERE = [("lang", "=", "py")]
    COLS = ["content"]  # 'lang' is filtered on but not replicated

    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "go", "v1"),
                ev(3, "insert", "r2", "c", "c1", "py", "v1"),
            ]
        ),
        0,
        3,
    )
    m1 = replicate(src, dst, where=WHERE, columns=COLS)
    assert m1["mode"] == "incremental"
    assert _proj_state(dst, ["content"]) == {
        ("r1", "a"): ("v1",),
        ("r2", "c"): ("v1",),
    }
    assert "lang" not in {f.name for f in dst.full_arrow_schema()}

    # a leaves the predicate (py -> go), b enters (go -> py), c deleted
    src.apply_window(
        make_ds(
            [
                ev(4, "update", "r1", "a", "c2", "go", "v2"),
                ev(5, "update", "r1", "b", "c2", "py", "v2"),
                ev(6, "delete", "r2", "c"),
            ]
        ),
        3,
        6,
    )
    m2 = replicate(src, dst, where=WHERE, columns=COLS)
    assert m2["mode"] == "incremental"
    assert _proj_state(dst, ["content"]) == {("r1", "b"): ("v2",)}

    # idempotent noop with an unchanged filter
    assert replicate(src, dst, where=WHERE, columns=COLS)["mode"] == "noop"


def test_replica_filter_change_forces_resync(ray_session, tmp_path):
    """A round run under a DIFFERENT filter than the replica was built
    with must re-sync (previously excluded rows cannot be recovered
    incrementally), in every direction: filtered -> other filter,
    filtered -> plain, plain -> filtered."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "go", "v1"),
            ]
        ),
        0,
        2,
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    assert replicate(src, dst, where=[("lang", "=", "py")])["mode"] == "incremental"
    assert set(_state(dst)) == {("r1", "a")}

    # widen the filter: the 'go' row was never replicated -> resync
    m = replicate(src, dst, where=[("lang", "in", ["py", "go"])])
    assert m["mode"] == "resync"
    assert set(_state(dst)) == {("r1", "a"), ("r1", "b")}

    # drop the filter entirely -> plain replica (same rows here)
    assert replicate(src, dst)["mode"] == "resync"
    assert _state(dst) == _state(src)

    # narrow back down: resync must TOMBSTONE the now-excluded row
    m = replicate(src, dst, where=[("lang", "=", "py")])
    assert m["mode"] == "resync"
    assert set(_state(dst)) == {("r1", "a")}

    # same spec, different spelling (tuples vs lists, uppercase op)
    # normalizes to the same identity -> noop, not resync
    assert replicate(src, dst, where=(["lang", "=", "py"],))["mode"] == "noop"
    # in-list order does not change the identity either
    replicate(src, dst, where=[("lang", "in", ["go", "py"])])  # resync
    assert (
        replicate(src, dst, where=[("lang", "IN", ["py", "go"])])["mode"] == "noop"
    )


def test_replica_filtered_null_semantics_and_validation(ray_session, tmp_path):
    """SQL three-valued logic: NULL filter values are excluded by =,
    in AND not-in (pc.invert(is_in) alone would admit them); spec
    validation rejects unknown ops/columns and non-payload columns."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", None, "v1"),
                ev(3, "insert", "r1", "c", "c1", "go", "v1"),
            ]
        ),
        0,
        3,
    )
    d1 = LakeTable.create(str(tmp_path / "d1"), ["repo", "path"], 2)
    replicate(src, d1, where=[("lang", "not in", ["go"])])
    assert set(_state(d1)) == {("r1", "a")}  # NULL lang excluded too

    d2 = LakeTable.create(str(tmp_path / "d2"), ["repo", "path"], 2)
    replicate(src, d2, where=[("lang", "is null")])
    assert set(_state(d2)) == {("r1", "b")}

    d3 = LakeTable.create(str(tmp_path / "d3"), ["repo", "path"], 2)
    with pytest.raises(ValueError, match="unsupported where op"):
        replicate(src, d3, where=[("lang", "like", "p%")])
    with pytest.raises(ValueError, match="non-source columns"):
        replicate(src, d3, where=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="payload columns"):
        replicate(src, d3, columns=["repo"])
    with pytest.raises(ValueError, match="is null"):
        replicate(src, d3, where=[("lang", "=", None)])


def test_replica_filtered_excludes_everything(ray_session, tmp_path):
    """A predicate no source row satisfies: the bootstrap replica is
    empty, and a filter-narrowing resync against a populated replica
    tombstones every row (the anti join's right side is a 0-row
    filtered key set)."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    replicate(src, dst)
    assert set(_state(dst)) == {("r1", "a")}
    m = replicate(src, dst, where=[("lang", "=", "rust")])
    assert m["mode"] == "resync"
    assert _state(dst) == {}
    # watermark still advanced: unchanged filter -> noop
    assert replicate(src, dst, where=[("lang", "=", "rust")])["mode"] == "noop"


def test_where_sql_twin():
    """where_sql renders the exact ANSI twin of compile_where's spec."""
    from jitsu_ray.pipelines.replicate import where_sql

    assert (
        where_sql(
            [
                ("lang", "in", ["py", "go"]),
                ("n", ">=", 5),
                ("commit", "is not null"),
                ("path", "!=", "a'b"),
            ]
        )
        == "lang IN ('go', 'py') AND n >= 5 AND commit IS NOT NULL "
        "AND path <> 'a''b'"
    )


def test_where_spec_identity_and_literals(ray_session, tmp_path):
    """Round-5 advice pins: (a) compile_where([]) yields a BOOL-typed
    match-all mask even on a 0-row batch (null-typed [True]*0 would
    crash Table.filter); (b) in-list duplicates and conjunct order do
    not change the filter identity — a respelled predicate is a noop
    round, not a spurious full resync; (c) _sql_lit renders floats in
    e-notation (DuckDB DOUBLE, not DECIMAL) and rejects non-SQL types
    loudly."""
    import pyarrow as pa
    import pytest

    from jitsu_ray.pipelines.replicate import (
        compile_where,
        replicate,
        where_sql,
    )

    empty = pa.table({"lang": pa.array([], pa.string())})
    mask = compile_where([])(empty)
    assert mask.type == pa.bool_()
    assert empty.filter(mask).num_rows == 0

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    spec = [("lang", "in", ["py", "go"]), ("repo", "!=", "zzz")]
    assert replicate(src, dst, where=spec)["mode"] == "incremental"
    # reordered conjuncts + duplicated in-list values = SAME predicate
    respelled = [("repo", "!=", "zzz"), ("lang", "in", ["go", "py", "go"])]
    assert replicate(src, dst, where=respelled)["mode"] == "noop"

    assert where_sql([("score", ">", 1.5)]) == "score > 1.5e0"
    assert where_sql([("score", ">", 1e300)]) == "score > 1e+300"
    with pytest.raises(ValueError, match="unsupported type"):
        where_sql([("blob", "=", b"x")])
    with pytest.raises(ValueError, match="unsupported type"):
        compile_where([("lang", "in", ["py", b"x"])])
    with pytest.raises(ValueError, match="finite"):
        where_sql([("score", "=", float("nan"))])


def test_filter_identity_legacy_tag_accepted(ray_session, tmp_path):
    """Upgrade path: a replica whose stored round tag carries the
    PRE-round-5 filter identity (conjuncts in caller order, in-lists
    undeduped) must NOT take a spurious full resync when the same spec
    is passed again — and the next round re-records the new form."""
    import glob
    import json

    from jitsu_ray.pipelines.replicate import (
        _legacy_filter_identity,
        replicate,
    )

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    spec = [("repo", "!=", "zzz"), ("lang", "in", ["py", "go", "py"])]
    assert replicate(src, dst, where=spec)["mode"] == "incremental"
    # rewrite the stored tag to the legacy canonical form in place
    legacy = _legacy_filter_identity(spec, None)
    rewritten = 0
    for f in sorted(glob.glob(os.path.join(dst.dir, "_ledger", "*.json"))):
        with open(f) as fh:
            e = json.load(fh)
        rep = (e.get("metrics") or {}).get("replication")
        if rep and rep.get("filter"):
            assert rep["filter"] != legacy  # new form really differs
            rep["filter"] = legacy
            with open(f, "w") as fh:
                json.dump(e, fh)
            rewritten += 1
    assert rewritten == 1
    # same spec against the legacy tag: noop, not resync
    assert replicate(src, dst, where=spec)["mode"] == "noop"
    # a genuinely different spec still resyncs
    assert replicate(src, dst, where=[("repo", "!=", "aaa")])["mode"] == "resync"


def test_replica_keys_only_and_degenerate_specs(ray_session, tmp_path):
    """Review-fix pins: columns=[] is a KEYS-ONLY replica with its own
    filter identity (switching to full payload must resync, not ride the
    empty-list/None truthiness collision); where=[] is the match-all
    conjunction (same identity as no filter); bare strings in in-lists
    and duplicate column names are rejected loudly."""
    from jitsu_ray.pipelines.replicate import replicate

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 2)
    src.apply_window(
        make_ds([ev(1, "insert", "r1", "a", "c1", "py", "v1")]), 0, 1
    )
    dst = LakeTable.create(str(tmp_path / "dst"), ["repo", "path"], 2)
    assert replicate(src, dst, columns=[])["mode"] == "incremental"
    assert set(dst.read().take_all()[0]) >= {"repo", "path"}
    assert "content" not in {f.name for f in dst.full_arrow_schema()}
    # keys-only -> full payload is a filter CHANGE: resync + payload backfill
    m = replicate(src, dst)
    assert m["mode"] == "resync"
    assert _state(dst) == _state(src)
    # where=[] == no filter: same identity -> noop
    assert replicate(src, dst, where=[])["mode"] == "noop"

    with pytest.raises(ValueError, match="LIST of values"):
        replicate(src, dst, where=[("lang", "in", "py")])
    with pytest.raises(ValueError, match="duplicate names"):
        replicate(src, dst, columns=["content", "content"])


def test_replicate_many_shared_diff_fanout(ray_session, tmp_path):
    """One source fanned out to three replicas (plain, filtered,
    keys-only) in one call: the CDC diff is computed ONCE for targets
    sharing a watermark (counted via a diff_as_of wrapper), every
    replica matches its own filter/projection of source state, and
    planning is fail-fast (a bad later target raises before ANY
    replica is written)."""
    from jitsu_ray.pipelines.replicate import replicate_many

    src = LakeTable.create(str(tmp_path / "src"), ["repo", "path"], 4)
    src.apply_window(
        make_ds(
            [
                ev(1, "insert", "r1", "a", "c1", "py", "v1"),
                ev(2, "insert", "r1", "b", "c1", "go", "v1"),
                ev(3, "insert", "r2", "c", "c1", "py", "v1"),
            ]
        ),
        0,
        3,
    )
    d_plain = LakeTable.create(str(tmp_path / "plain"), ["repo", "path"], 2)
    d_py = LakeTable.create(str(tmp_path / "py"), ["repo", "path"], 2)
    d_keys = LakeTable.create(str(tmp_path / "keys"), ["repo", "path"], 2)
    targets = [
        {"dst": d_plain},
        {"dst": d_py, "where": [("lang", "=", "py")], "columns": ["content"]},
        {"dst": d_keys, "columns": []},
    ]

    calls = []
    real = src.diff_as_of

    def counted(*a, **k):
        calls.append(a)
        return real(*a, **k)

    src.diff_as_of = counted
    try:
        res = replicate_many(src, targets)
    finally:
        del src.diff_as_of
    assert [r["mode"] for r in res] == ["incremental"] * 3
    # BOOTSTRAP (frm=0) is exempt from the shared materialize — the
    # "diff" there is the whole source state, which must stream rather
    # than pin O(state) in the object store: three solo scans
    assert len(calls) == 3 and all(a == (0, 3) for a in calls)
    assert _state(d_plain) == _state(src)
    assert _proj_state(d_py, ["content"]) == {
        ("r1", "a"): ("v1",),
        ("r2", "c"): ("v1",),
    }
    assert set(_proj_state(d_keys, [])) == set(_state(src))

    # second wave: b enters the predicate, a deleted
    src.apply_window(
        make_ds(
            [
                ev(4, "update", "r1", "b", "c2", "py", "v2"),
                ev(5, "delete", "r1", "a"),
            ]
        ),
        3,
        5,
    )
    calls.clear()
    src.diff_as_of = counted
    try:
        res = replicate_many(src, targets)
    finally:
        del src.diff_as_of
    assert [r["mode"] for r in res] == ["incremental"] * 3
    # INCREMENTAL wave: one shared (3, 5] scan drives all three replicas
    assert len(calls) == 1 and calls[0] == (3, 5)
    assert _state(d_plain) == _state(src)
    assert _proj_state(d_py, ["content"]) == {
        ("r1", "b"): ("v2",),
        ("r2", "c"): ("v1",),
    }

    # fail-fast: a later target's bad spec raises BEFORE any apply
    src.apply_window(make_ds([ev(6, "insert", "r2", "d", "c1", "py", "v1")]), 5, 6)
    before = _state(d_plain)
    with pytest.raises(ValueError, match="non-source columns"):
        replicate_many(
            src, [{"dst": d_plain}, {"dst": d_py, "where": [("nope", "=", 1)]}]
        )
    assert _state(d_plain) == before  # nothing was written
    # duplicate destination: the second target's apply would be silently
    # swallowed by the idempotent window skip — rejected up front
    with pytest.raises(ValueError, match="share the destination"):
        replicate_many(src, [{"dst": d_plain}, {"dst": d_plain, "columns": []}])
    assert _state(d_plain) == before

    # a target at a UNIQUE watermark joins the fan-out without a shared
    # scan for it: bootstrap a fourth replica alongside the caught-up trio
    d_new = LakeTable.create(str(tmp_path / "new"), ["repo", "path"], 2)
    res = replicate_many(src, targets + [{"dst": d_new}])
    assert [r["mode"] for r in res] == ["incremental"] * 4
    assert _state(d_new) == _state(src) == _state(d_plain)
