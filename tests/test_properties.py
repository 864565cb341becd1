"""Property-based invariants (hypothesis): the LWW fold is exact for
arbitrary event interleavings/windowings; the promotion lattice is a
join-semilattice; resolve matches a naive Python oracle. Plus stress
shapes: multi-MB content rows and a single pathological hot key."""

import hypothesis.strategies as st
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings

from jitsu_ray.sinks.lake import LakeTable, resolve_arrow, resolve_keep_tombstones
from jitsu_ray.types import DataType as T
from jitsu_ray.types import promote


@given(st.sampled_from(list(T)), st.sampled_from(list(T)), st.sampled_from(list(T)))
def test_promote_is_join_semilattice(a, b, c):
    assert promote(a, b) == promote(b, a)  # commutative
    assert promote(a, promote(b, c)) == promote(promote(a, b), c)  # associative
    assert promote(a, a) == a  # idempotent
    assert promote(a, T.UNKNOWN) == a  # identity


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # key id
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=40,
)


def build_table(evs):
    rows = []
    for seq, (k, op) in enumerate(evs, start=1):
        rows.append(
            {
                "commit_seq": seq,
                "op": op,
                "repo": f"r{k % 2}",
                "path": f"p{k}",
                "content": None if op == "delete" else f"v{seq}",
            }
        )
    return pa.table(
        {
            "commit_seq": pa.array([r["commit_seq"] for r in rows], pa.int64()),
            "op": pa.array([r["op"] for r in rows], pa.string()),
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.large_string()),
        }
    )


def naive_oracle(evs):
    state = {}
    for seq, (k, op) in enumerate(evs, start=1):
        key = (f"r{k % 2}", f"p{k}")
        state[key] = (seq, None if op == "delete" else f"v{seq}", op)
    return {
        k: (seq, content)
        for k, (seq, content, op) in state.items()
        if op != "delete"
    }


@given(events_strategy, st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_resolve_matches_oracle_any_order(evs, rnd):
    tbl = build_table(evs)
    # deliver in arbitrary order: resolution must not care
    idx = list(range(tbl.num_rows))
    rnd.shuffle(idx)
    shuffled = tbl.take(pa.array(idx))
    out = resolve_arrow(shuffled, ["repo", "path"])
    got = {
        (r["repo"], r["path"]): (r["commit_seq"], r["content"])
        for r in out.to_pylist()
    }
    assert got == naive_oracle(evs)


@given(events_strategy, st.integers(1, 5))
@settings(max_examples=30, deadline=None)
def test_fold_split_invariance(evs, n_chunks):
    """resolve(concat(resolve(chunk_i))) == resolve(whole): the combiner
    tree can split anywhere (batch combiner, ingest fold, finish fold,
    compaction) without changing the result."""
    tbl = build_table(evs)
    size = max(1, tbl.num_rows // n_chunks)
    parts = [
        resolve_keep_tombstones(tbl.slice(i, size), ["repo", "path"])
        for i in range(0, tbl.num_rows, size)
    ]
    via_chunks = resolve_arrow(pa.concat_tables(parts), ["repo", "path"])
    direct = resolve_arrow(tbl, ["repo", "path"])
    key = lambda t: sorted(
        (r["repo"], r["path"], r["commit_seq"]) for r in t.to_pylist()
    )
    assert key(via_chunks) == key(direct)


def test_wide_rows_multi_mb_content(ray_session, tmp_path):
    # §7.4 hard part: content columns of MBs flow through apply/read intact
    import ray.data

    big = "x" * (3 * 1024 * 1024)
    rows = 8
    tbl = pa.table(
        {
            "commit_seq": pa.array(range(1, rows + 1), pa.int64()),
            "op": pa.array(["insert"] * rows, pa.string()),
            "repo": pa.array([f"r{i}" for i in range(rows)], pa.string()),
            "path": pa.array(["p"] * rows, pa.string()),
            "content": pa.array([big + str(i) for i in range(rows)], pa.large_string()),
        }
    )
    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 4)
    lake.apply_window(ray.data.from_arrow(tbl), 0, rows)
    out = lake.read().take_all()
    assert len(out) == rows
    assert all(len(r["content"]) == len(big) + 1 for r in out)


def test_hot_single_key(ray_session, tmp_path):
    # all events on ONE key: irreducible co-location, merge stays cheap
    import ray.data

    n = 20_000
    tbl = pa.table(
        {
            "commit_seq": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array(["insert"] + ["update"] * (n - 1), pa.string()),
            "repo": pa.array(["hot"] * n, pa.string()),
            "path": pa.array(["one"] * n, pa.string()),
            "content": pa.array([f"v{i}" for i in range(n)], pa.large_string()),
        }
    )
    lake = LakeTable.create(str(tmp_path / "lake"), ["repo", "path"], 8)
    lake.apply_window(ray.data.from_arrow(tbl), 0, n)
    out = lake.read().take_all()
    assert len(out) == 1
    assert out[0]["commit_seq"] == n and out[0]["content"] == f"v{n-1}"


asof_strategy = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right: (key, ts, val) — (key, ts) may collide; pre-agg dedupes
        st.tuples(st.integers(0, 4), st.integers(0, 50), st.integers(0, 100)),
        min_size=0,
        max_size=25,
    ),
)


@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_bucket_asof_join_matches_global_polars(ray_session, case):
    # distributed bucketed as-of == one global polars join_asof for
    # arbitrary key/ts interleavings (incl. empty right, all-miss keys)
    import polars as pl
    import ray.data

    from jitsu_ray.ops.join import bucket_asof_join

    lrows, rrows = case
    left = pa.table(
        {
            "k": pa.array([k for k, _ in lrows], pa.int64()),
            "lts": pa.array([t for _, t in lrows], pa.int64()),
            "lid": pa.array(range(len(lrows)), pa.int64()),
        }
    )
    # dedupe right (key, ts) by max val — the right_pre_join contract
    rmap: dict = {}
    for k, t, v in rrows:
        rmap[(k, t)] = max(v, rmap.get((k, t), -1))
    right = pa.table(
        {
            "k": pa.array([k for k, _ in rmap], pa.int64()),
            "rts": pa.array([t for _, t in rmap], pa.int64()),
            "val": pa.array(list(rmap.values()), pa.int64()),
        }
    )
    got_tbl = bucket_asof_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2) if right.num_rows else ray.data.from_arrow(right),
        "k", "lts", "rts", num_buckets=3,
    ).take_all()
    # exactly one output row per left row (a bucketing bug that emits a
    # row twice would be masked by the dict comprehension below)
    assert len(got_tbl) == left.num_rows
    got = {r["lid"]: r["val"] for r in got_tbl}
    exp_df = (
        pl.from_arrow(left)
        .sort("lts")
        .join_asof(
            pl.from_arrow(right).sort("rts"),
            left_on="lts", right_on="rts", by="k", strategy="backward",
            check_sortedness=False,
        )
    )
    exp = dict(zip(exp_df["lid"].to_list(), exp_df["val"].to_list()))
    assert got == exp


def test_corpus_pipeline_staged_path_matches(ray_session, monkeypatch):
    # round-3 verdict #5: forcing the staging budget to 0 routes the
    # pinned intermediate through a durable parquet staging write; the
    # pipeline output must be identical to the object-store path
    from jitsu_ray.queries import q_corpus_pipeline

    sf = "/root/testdata/sf0.001"

    def rows(ds):
        return sorted(
            (r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_md5"])
            for r in ds.take_all()
        )

    base = rows(q_corpus_pipeline(sf))
    monkeypatch.setenv("JITSU_STAGE_BUDGET_BYTES", "0")
    staged = rows(q_corpus_pipeline(sf))
    assert staged == base and len(base) > 0


# printable-ish unicode WITHOUT NUL (DuckDB VARCHAR rejects it) or
# surrogates; includes '|' (the CMS row-hash separator — unambiguous
# because the row prefix is always a single digit), NBSP, CJK, emoji
_key_alphabet = st.characters(
    blacklist_categories=("Cs",), blacklist_characters="\x00"
)


@settings(deadline=None, max_examples=25)
@given(
    st.dictionaries(
        st.text(_key_alphabet, min_size=1, max_size=8),
        st.integers(1, 50),
        min_size=1,
        max_size=30,
    )
)
def test_cms_registers_match_duckdb_twin(counts):
    """The CountMinSketch row hash is the exact DuckDB twin on ANY
    unicode key, and estimates never undercount."""
    import duckdb
    import numpy as np

    from jitsu_ray.ops.sketch import CountMinSketch

    d, w = 3, 64
    keys = list(counts)
    ns = np.array([counts[k] for k in keys], dtype=np.int64)
    sk = CountMinSketch(d, w).add_counts(keys, ns)
    assert (sk.estimate_many(keys) >= ns).all()

    con = duckdb.connect()
    con.register("c", pa.table({"w": pa.array(keys), "n": pa.array(ns)}))
    cells = con.sql(
        f"""SELECT i, CAST(md5_number_lower(CAST(i AS VARCHAR) || '|' || w) % {w} AS BIGINT) AS b,
                   CAST(SUM(n) AS BIGINT) AS reg
            FROM c CROSS JOIN range({d}) t(i) GROUP BY 1, 2"""
    ).fetchall()
    sql_regs = np.zeros((d, w), dtype=np.int64)
    for i, b, reg in cells:
        sql_regs[i, b] = reg
    assert (sql_regs == sk.regs).all()


_text_alphabet = st.characters(
    blacklist_categories=("Cs",), blacklist_characters="\x00"
)


@settings(
    deadline=None, max_examples=10, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.one_of(st.none(), st.text(_text_alphabet, max_size=40)),
        min_size=1,
        max_size=12,
    )
)
def test_classifier_matches_sql_oracle_any_text(ray_session, texts):
    """score_text_hashed == SQL_CLASSIFIER on arbitrary unicode/null
    text — the tokenizer class, md5 feature hash, and integer-weight
    sum must agree char-for-char (the full oracle-parity surface)."""
    import duckdb
    import ray
    import ray.data

    from jitsu_ray.ops.ml import rule_weights, score_text_hashed
    from jitsu_ray.queries import SQL_CLASSIFIER

    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = sorted(
        (r["doc_id"], r["score"], r["keep"])
        for r in score_text_hashed(
            ray.data.from_arrow(tbl).repartition(2),
            ray.put(rule_weights(65536)),
            dim=65536,
        ).take_all()
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(row) for row in con.sql(SQL_CLASSIFIER).fetchall())
    assert got == want
