"""Standalone simulation of the driver's correctness harness: run each
queries() entry at a given sf and compare with oracle_sql() via DuckDB
(row count + column names/types + order-insensitive value multiset).
Not a pytest file — run directly:  python tests/harness_sim.py [sf_dir]
(optional second arg: comma-separated query names to run a subset)
"""

import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def to_arrow(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return pa.Table.from_pylist(res.take_all())


def canon(tbl):
    """Order-insensitive canonical multiset of rows, column-name sorted.

    TYPE-SENSITIVE on purpose (round-2 ADVICE): the driver's value hash
    distinguishes int 5 from str "5"; a plain str() canon masked the
    lake key-dtype bug locally while the driver flagged it. bool is a
    subclass of int, so tag by type name, not isinstance buckets."""
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = []
    for r in tbl.to_pylist():
        rows.append(
            tuple((k, type(r[k]).__name__, str(r[k])) for k in cols)
        )
    return sorted(rows)


def main(sf_dir="/root/testdata/sf0.01", only=""):
    import ray

    sys.path.insert(0, "/root/repo")
    from jitsu_ray.util import quiet_runtime_env

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR",
             runtime_env=quiet_runtime_env())
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql(sf_dir)
    if only:
        pick = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in pick if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in pick}
    report = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            res = to_arrow(fn(sf_dir))
            sec = round(time.perf_counter() - t0, 2)
            if name in oracles:
                exp = con.sql(oracles[name]).arrow()
                ok_rows = res.num_rows == exp.num_rows
                ok_cols = sorted(res.column_names) == sorted(exp.column_names)
                ok_vals = canon(res) == canon(exp) if ok_rows and ok_cols else False
                report[name] = {
                    "rows": res.num_rows,
                    "oracle_rows": exp.num_rows,
                    "cols_match": ok_cols,
                    "values_match": ok_vals,
                    "sec": sec,
                }
            else:
                report[name] = {"rows": res.num_rows, "rows_only": True, "sec": sec}
        except Exception as e:
            report[name] = {"ERROR": f"{type(e).__name__}: {e}"[:300]}
        # stream per-query verdicts so a killed/timed-out run still
        # leaves the completed prefix on record
        print(f"# {name}: {json.dumps(report[name])}", file=sys.stderr, flush=True)
    print(json.dumps(report, indent=1))
    bad = [
        n
        for n, r in report.items()
        if "ERROR" in r or (not r.get("rows_only") and not r.get("values_match"))
    ]
    print("FAILING:", bad if bad else "none")
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
