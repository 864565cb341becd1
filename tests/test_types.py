"""Type lattice + casts. Mirrors server/typing/converter_test.go /
datatype_test.go table-driven cases."""

import pyarrow as pa
import pytest

from jitsu_ray.types import DataType as T
from jitsu_ray.types import cast_array, from_arrow, promote, promote_many, to_arrow


@pytest.mark.parametrize(
    "a,b,want",
    [
        (T.BOOL, T.BOOL, T.BOOL),
        (T.BOOL, T.INT64, T.INT64),
        (T.INT64, T.FLOAT64, T.FLOAT64),
        (T.BOOL, T.FLOAT64, T.FLOAT64),
        (T.FLOAT64, T.TIMESTAMP, T.STRING),
        (T.INT64, T.TIMESTAMP, T.STRING),
        (T.TIMESTAMP, T.STRING, T.STRING),
        (T.BOOL, T.TIMESTAMP, T.STRING),
        (T.UNKNOWN, T.INT64, T.INT64),
        (T.STRING, T.INT64, T.STRING),
    ],
)
def test_promote_lca(a, b, want):
    assert promote(a, b) == want
    assert promote(b, a) == want


def test_promote_many():
    assert promote_many([T.BOOL, T.INT64, T.FLOAT64]) == T.FLOAT64
    assert promote_many([T.INT64, T.FLOAT64, T.TIMESTAMP]) == T.STRING
    assert promote_many([]) == T.UNKNOWN


def test_arrow_roundtrip():
    for t in [T.BOOL, T.INT64, T.FLOAT64, T.STRING, T.TIMESTAMP]:
        assert from_arrow(to_arrow(t)) == t
    assert from_arrow(pa.int32()) == T.INT64
    assert from_arrow(pa.float32()) == T.FLOAT64
    assert from_arrow(pa.string()) == T.STRING
    with pytest.raises(TypeError):
        from_arrow(pa.list_(pa.int64()))


def test_casts():
    assert cast_array(pa.array([True, False]), T.INT64).to_pylist() == [1, 0]
    assert cast_array(pa.array([True, False]), T.STRING).to_pylist() == ["true", "false"]
    assert cast_array(pa.array([1, 2]), T.FLOAT64).to_pylist() == [1.0, 2.0]
    assert cast_array(pa.array([1.5]), T.STRING).to_pylist() == ["1.5"]
    ts = cast_array(pa.array(["2024-01-02T03:04:05.000006Z"]), T.TIMESTAMP)
    assert pa.types.is_timestamp(ts.type)
    back = cast_array(ts, T.STRING)
    assert back.to_pylist() == ["2024-01-02T03:04:05.000006Z"]


def test_query_inventory_integrity():
    """Driver-contract invariants the round gate depends on: every
    registered query has an oracle (CLAUDE.md hard rule — the two dicts
    must never drift apart), the bench set only names real queries, and
    __ray_entry__ re-exports the same registries."""
    import __ray_entry__ as entry
    from bench import BENCH_QUERIES
    from jitsu_ray.queries import ORACLES, QUERIES

    # 9 oracles are DYNAMIC (generated-input SQL, built inside
    # oracle_sql()), so static ORACLES is a strict subset; the driver-
    # facing contract is exact key parity at the entry level
    assert set(ORACLES) <= set(QUERIES)
    assert set(BENCH_QUERIES) <= set(QUERIES)
    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(QUERIES)
    assert all(callable(f) for f in QUERIES.values())
    assert all(
        isinstance(s, str) and s.strip() for s in entry.oracle_sql().values()
    )
