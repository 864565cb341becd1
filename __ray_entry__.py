"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module;
nothing here (or in jitsu_ray) initialises or shuts down Ray.

- ``entry()``: flagship CDC replay on sf0.001 — synthetic changelog ->
  windowed replay -> converged LWW lake -> resolved Dataset with
  sha256(content) per row.
- ``queries()``: one callable per implemented operator family from
  SURVEY.md §2 (see jitsu_ray/queries.py for the inventory).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query, column-name aligned with the Ray results.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from jitsu_ray.queries import ORACLES, QUERIES, dynamic_oracles


def entry() -> Any:
    return QUERIES["cdc_replay"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """No-arg call (the driver contract) yields the sf=0.01 oracles;
    the optional sf_dir lets local harness sweeps at other scale
    factors get oracles over matching generated inputs."""
    d = dict(ORACLES)
    # oracles over generated inputs (cdc changelog, geo table) embed a
    # cached parquet path the builder ensures exists
    d.update(dynamic_oracles(sf_dir))
    return d
