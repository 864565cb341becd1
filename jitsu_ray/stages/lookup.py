"""Dictionary-lookup enrichers (SURVEY §2.3 T1/T2): geo-IP range lookup
and user-agent parsing.

Reference parity: the Jitsu enricher resolves an event's IP against a
MaxMind-style range database (server/enrichment/ip_lookup.go:32-64,
server/geo/geo.go:40-86) and parses the user agent with a compiled
resolver cached per process (server/useragent/resolver.go:24-80).

Ray-first shape: both are ``map_batches`` stages running as plain
tasks on warm workers — the range table / compiled regex corpus is
broadcast via ``ray.put`` once and built once per worker process
(util.once_per_process); each batch is enriched with
vectorized kernels (numpy searchsorted for ranges, polars regex for
UA). No external databases: the geo table is generated deterministically
(the container has no MaxMind data) and user agents come from a fixed
public-shaped corpus; both derivations have exact DuckDB twins so the
driver oracle can range-join / regexp_extract the same values.
"""

from __future__ import annotations

import os

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from ..util import md5_lower64 as _md5_lower64_str

GEO_COUNTRIES = ["US", "DE", "FR", "GB", "ES", "BR", "IN", "JP", "AU", "CA"]


def gen_geo_table(n_ranges: int = 4096, fill: float = 0.6) -> pa.Table:
    """Deterministic non-overlapping CIDR-style range table over the
    IPv4 space: range i owns [i*slot, i*slot + fill*slot); the gap
    between ranges exercises the lookup-miss path. Purely a function of
    (n_ranges, fill) — no RNG, so the DuckDB oracle can read the same
    table from the cached parquet."""
    slot = (1 << 32) // n_ranges
    starts = np.arange(n_ranges, dtype=np.int64) * slot
    ends = starts + int(slot * fill) - 1
    country = [GEO_COUNTRIES[i % len(GEO_COUNTRIES)] for i in range(n_ranges)]
    city = [f"city_{i % 97}" for i in range(n_ranges)]
    return pa.table(
        {
            "ip_from": pa.array(starts, pa.int64()),
            "ip_to": pa.array(ends, pa.int64()),
            "country": pa.array(country, pa.string()),
            "city": pa.array(city, pa.string()),
        }
    )


def ensure_geo_parquet(cache_dir: str, n_ranges: int = 4096) -> str:
    """Write-once cache of the geo table (the oracle SQL reads this
    path; the enricher broadcasts the same table)."""
    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"geo_r{n_ranges}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_geo_table(n_ranges), tmp)
        os.replace(tmp, path)
    return path


def derive_ip_column(id_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Deterministic dotted-quad IP per id: the lower 32 bits of
    md5_number_lower(CAST(id AS VARCHAR)). Stands in for a real client
    IP column; the oracle derives the identical ipnum in SQL."""
    ids = id_col.to_pylist()
    cache: dict[int, str] = {}
    out = []
    for i in ids:
        ip = cache.get(i)
        if ip is None:
            n = _md5_lower64_str(str(i)) & 0xFFFFFFFF
            ip = f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"
            cache[i] = ip
        out.append(ip)
    return pa.array(out, pa.string())


class GeoIpEnricher:
    """Range-lookup stage state: dotted-quad ``ip`` column ->
    country/city via binary search over the broadcast sorted range
    table (ip_lookup.go's resolver re-expressed as searchsorted per
    batch). Built once per worker process (geo_enrich) or per actor
    (concurrency=N); misses yield nulls."""

    def __init__(self, geo_ref):
        tbl = ray.get(geo_ref) if not isinstance(geo_ref, pa.Table) else geo_ref
        self.ip_from = np.asarray(tbl["ip_from"].to_numpy(zero_copy_only=False))
        self.ip_to = np.asarray(tbl["ip_to"].to_numpy(zero_copy_only=False))
        self.country = np.asarray(tbl["country"].to_pylist(), dtype=object)
        self.city = np.asarray(tbl["city"].to_pylist(), dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({"ip": batch["ip"]}))
        parts = df.with_columns(
            pl.col("ip").str.split(".").cast(pl.List(pl.Int64)).alias("o")
        ).select(
            (
                pl.col("o").list.get(0) * 16777216
                + pl.col("o").list.get(1) * 65536
                + pl.col("o").list.get(2) * 256
                + pl.col("o").list.get(3)
            ).alias("ipnum")
        )
        ipnum = parts["ipnum"].to_numpy()
        idx = np.searchsorted(self.ip_from, ipnum, side="right") - 1
        idx_c = np.clip(idx, 0, len(self.ip_from) - 1)
        hit = (idx >= 0) & (ipnum <= self.ip_to[idx_c])
        country = np.where(hit, self.country[idx_c], None)
        city = np.where(hit, self.city[idx_c], None)
        batch = batch.append_column("country", pa.array(country.tolist(), pa.string()))
        return batch.append_column("city", pa.array(city.tolist(), pa.string()))


def geo_enrich(ds, geo_tbl: pa.Table, concurrency=None):
    """events-with-ip Dataset -> +country/+city. The range table is
    ray.put ONCE; plain tasks on warm workers build the enricher once
    per process from the shared ref (util.once_per_process — bounded,
    replace-on-new-ref) — no per-query actor startup. Pass
    ``concurrency`` to force an actor pool instead."""
    ref = ray.put(geo_tbl)
    if concurrency:
        return ds.map_batches(
            GeoIpEnricher,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs={"geo_ref": ref},
        )

    def run(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..util import once_per_process

        enricher = once_per_process("geo_enrich", _ref, build=GeoIpEnricher)
        return enricher(batch)

    return ds.map_batches(run, batch_format="pyarrow")


# -- user agent (T2) ---------------------------------------------------------

UA_CORPUS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.110 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.159 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 Edg/119.0.2151.58",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
    "curl/8.4.0",
]

# ordered first-match rules (Edge before Chrome: Edge UAs contain
# "Chrome/"), mirroring useragent/resolver.go's corpus walk
UA_BROWSER_RULES = [
    ("Edge", r"Edg/([0-9.]+)"),
    ("Chrome", r"Chrome/([0-9.]+)"),
    ("Firefox", r"Firefox/([0-9.]+)"),
    ("Safari", r"Version/([0-9.]+).*Safari"),
    ("curl", r"curl/([0-9.]+)"),
]
UA_OS_RULES = [
    ("ios", r"iPhone OS"),
    ("android", r"Android"),
    ("windows", r"Windows NT"),
    ("macos", r"Mac OS X"),
    ("linux", r"Linux"),
]


def derive_ua_column(id_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Deterministic UA per id: corpus[md5_number_lower(str(id)) % 8]."""
    ids = id_col.to_pylist()
    return pa.array(
        [UA_CORPUS[_md5_lower64_str(str(i)) % len(UA_CORPUS)] for i in ids], pa.string()
    )


class UserAgentParser:
    """Stateless ``map_batches`` stage (pass an instance — plain warm-
    worker tasks): ``ua`` column -> browser / browser_version / os as
    vectorized polars regex scans (one pass per rule), first match
    wins."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({"ua": batch["ua"]}))
        browser = pl.lit(None, dtype=pl.String)
        version = pl.lit(None, dtype=pl.String)
        for name, pat in reversed(UA_BROWSER_RULES):
            m = pl.col("ua").str.extract(pat, 1)
            browser = pl.when(m.is_not_null()).then(pl.lit(name)).otherwise(browser)
            version = pl.when(m.is_not_null()).then(m).otherwise(version)
        os_expr = pl.lit(None, dtype=pl.String)
        for name, pat in reversed(UA_OS_RULES):
            hit = pl.col("ua").str.contains(pat)
            os_expr = pl.when(hit).then(pl.lit(name)).otherwise(os_expr)
        out = df.select(
            browser.alias("browser"), version.alias("browser_version"), os_expr.alias("os")
        ).to_arrow()
        for c in out.column_names:
            col = out[c]
            batch = batch.append_column(
                c, col.cast(pa.string()) if col.type == pa.large_string() else col
            )
        return batch
