"""Transform-layer parity tests (FIXTURES.md F4): mapping DSL, flattener,
router skip, UDF transform contract, enrichment determinism."""

import pyarrow as pa
import pytest

from jitsu_ray.stages.enrich import add_constant, add_event_id, add_timestamp, chain, hash_pii
from jitsu_ray.stages.flatten import flatten_json_object, flatten_struct_columns, normalize_key
from jitsu_ray.stages.mapping import compile_mapping, parse_rule
from jitsu_ray.stages.router import compile_template, route_stage
from jitsu_ray.stages.transform import TABLE_COL, udf_transform_stage


def test_normalize_key():
    # flattener.go:10-32 char set
    assert normalize_key("$Weird (Key)") == "_weird__key_"
    assert normalize_key("a.b-c d") == "a_b_c_d"


def test_flatten_struct_and_list():
    batch = pa.table(
        {
            "a": pa.array([{"b": 1, "C d": {"e": "x"}}, {"b": 2, "C d": {"e": "y"}}]),
            "tags": pa.array([[1, 2], [3]]),
            "plain": pa.array(["p", "q"]),
        }
    )
    out = flatten_struct_columns(batch)
    assert set(out.column_names) == {"a_b", "a_c_d_e", "tags", "plain"}
    assert out["a_b"].to_pylist() == [1, 2]
    assert out["a_c_d_e"].to_pylist() == ["x", "y"]
    assert out["tags"].to_pylist() == ["[1, 2]", "[3]"]  # JSON-serialized


def test_flatten_json_object_drops_nil():
    assert flatten_json_object({"a": {"b": 1}, "n": None, "l": [1, "x"]}) == {
        "a_b": 1,
        "l": '[1, "x"]',
    }


def test_mapping_dsl():
    fn = compile_mapping(
        [
            {"action": "move", "src": "/user/id", "dst": "/uid"},
            {"action": "remove", "src": "/secret"},
            {"action": "cast", "src": "/n", "type": "float64"},
            {"action": "constant", "dst": "/src", "value": "api"},
        ]
    )
    batch = pa.table(
        {"user_id": pa.array([7]), "secret": pa.array(["x"]), "n": pa.array([1]), "keep": pa.array(["k"])}
    )
    out = fn(batch)
    assert out["uid"].to_pylist() == [7]
    assert "secret" not in out.column_names
    assert out["n"].to_pylist() == [1.0] and pa.types.is_floating(out["n"].type)
    assert out["src"].to_pylist() == ["api"]
    assert out["keep"].to_pylist() == ["k"]  # keep_unmapped default


def test_mapping_keep_unmapped_false_and_old_style():
    assert parse_rule("/a -> (int64) /b") == {
        "action": "move",
        "src": "/a",
        "dst": "/b",
        "type": "int64",
    }
    fn = compile_mapping(["/a -> /b"], keep_unmapped=False)
    out = fn(pa.table({"a": pa.array([1]), "z": pa.array([2])}))
    assert out.column_names == ["b"]


def test_router_template_and_skip():
    fn = route_stage("{lang}_events")
    batch = pa.table({"lang": pa.array(["py", None, "go"]), "v": pa.array([1, 2, 3])})
    out = fn(batch)
    # null lang -> "" -> "_events"? No: fill_null("") gives "_events" which is
    # non-empty; the skip applies to fully-empty names only
    assert out[TABLE_COL].to_pylist() == ["py_events", "_events", "go_events"]
    fn2 = route_stage("{lang}")
    out2 = fn2(batch)
    assert out2[TABLE_COL].to_pylist() == ["py", "go"]  # null row skipped
    assert out2["v"].to_pylist() == [1, 3]


def test_udf_transform_multiply_drop_error():
    def tf(ev):
        if ev["kind"] == "boom":
            raise ValueError("bad")
        if ev["kind"] == "drop":
            return None
        return f"t_{ev['kind']}", [{"v": ev["v"]}, {"v": ev["v"] * 10}]

    stage = udf_transform_stage(tf)
    batch = pa.table(
        {"kind": pa.array(["a", "drop", "boom"]), "v": pa.array([1, 2, 3])}
    )
    out = stage(batch)
    good = out.filter(pa.compute.not_equal(out[TABLE_COL], ""))
    dead = out.filter(pa.compute.equal(out[TABLE_COL], ""))
    assert good["v"].to_pylist() == [1, 10]
    assert good[TABLE_COL].to_pylist() == ["t_a", "t_a"]
    assert dead.num_rows == 1 and "ValueError" in dead["__error"][0].as_py()


def test_enrichment_chain_deterministic():
    stage = chain(
        add_timestamp(),
        add_constant("src", "api"),
        add_event_id(["repo", "path", "commit_seq"]),
    )
    batch = pa.table(
        {
            "commit_seq": pa.array([1, 2], pa.int64()),
            "repo": pa.array(["r", "r"]),
            "path": pa.array(["a", "b"]),
        }
    )
    out1, out2 = stage(batch), stage(batch)
    assert out1.equals(out2)  # no wall clock, no randomness
    assert out1["_timestamp"][0].as_py().year == 2024
    assert out1["src"].to_pylist() == ["api", "api"]
    assert len(set(out1["event_id"].to_pylist())) == 2


def test_hash_pii():
    import hashlib

    out = hash_pii(["email"])(pa.table({"email": pa.array([" Bob@X.COM ", None])}))
    assert out["email"][0].as_py() == hashlib.sha256(b"bob@x.com").hexdigest()
    assert out["email"][1].as_py() is None


def test_geo_ip_enricher(ray_session):
    import pyarrow as pa
    import ray.data

    from jitsu_ray.stages.lookup import GeoIpEnricher, gen_geo_table, geo_enrich

    geo = gen_geo_table(n_ranges=256, fill=0.5)
    # hit: an ip inside range 0 [0, slot/2); miss: one in the gap
    slot = (1 << 32) // 256
    inside = slot // 4
    gap = slot - 10
    ips = [f"{(x >> 24) & 255}.{(x >> 16) & 255}.{(x >> 8) & 255}.{x & 255}" for x in (inside, gap)]
    ds = ray.data.from_arrow(pa.table({"ip": pa.array(ips)}))
    out = geo_enrich(ds, geo, concurrency=1).take_all()
    assert out[0]["country"] == "US" and out[0]["city"] == "city_0"
    assert out[1]["country"] is None and out[1]["city"] is None
    # enricher state built once per actor: direct call agrees
    direct = GeoIpEnricher(geo)(pa.table({"ip": pa.array(ips)}))
    assert direct["country"].to_pylist() == ["US", None]


def test_ua_parser_rules(ray_session):
    import pyarrow as pa

    from jitsu_ray.stages.lookup import UA_CORPUS, UserAgentParser

    out = UserAgentParser()(pa.table({"ua": pa.array(UA_CORPUS)}))
    rows = out.to_pylist()
    by_ua = {r["ua"]: r for r in rows}
    edge = by_ua[UA_CORPUS[4]]
    assert edge["browser"] == "Edge" and edge["browser_version"].startswith("119.")
    chrome = by_ua[UA_CORPUS[0]]
    assert chrome["browser"] == "Chrome" and chrome["os"] == "windows"
    iphone = by_ua[UA_CORPUS[5]]
    assert iphone["browser"] == "Safari" and iphone["os"] == "ios"
    curl = by_ua[UA_CORPUS[7]]
    assert curl["browser"] == "curl" and curl["os"] is None
    android = by_ua[UA_CORPUS[6]]
    assert android["os"] == "android"
