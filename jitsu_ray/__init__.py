"""jitsu_ray: a Ray-Data-native CDC / incremental-ingest engine.

Brand-new implementation of the query/data-processing capabilities of
the reference (antonefremov/jitsu, an EventNative snapshot) re-targeted
as a batch-replayable CDC engine over Parquet tables of source code,
per BASELINE.json. See SURVEY.md for the operator-by-operator mapping.
"""

import os as _os

# Every Ray worker process that unpickles our UDFs imports this package
# first; pin polars to one thread per worker BEFORE its first import.
# Otherwise each of N workers spawns an N-thread pool (N^2 threads) and
# batch kernels anti-scale with cluster size (measured: 2M-row window
# 4.5x SLOWER at 32 CPUs than 8). Parallelism belongs to Ray's
# scheduler, not per-worker thread pools.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

# pyarrow 16 schemas with metadata are unhashable, so Ray's
# unify_schemas logs "Failed to hash the schemas" per concat of blocks
# whose parquet source embedded b'pandas' metadata. read_parquet_clean
# strips it where a stage can; reads with override_num_blocks concat
# INSIDE the read task before any stage runs, so belt-and-suspenders:
# silence that one module's logger (it emits nothing else). Runs in
# every worker because workers import this package.
import logging as _logging


class _DropSchemaHashWarning(_logging.Filter):
    def filter(self, record):  # noqa: A003 - logging API name
        return "Failed to hash the schemas" not in record.getMessage()


# a FILTER, not setLevel: Ray Data re-applies its logging config at
# every dataset execution, resetting levels — filters attached to the
# (singleton) emitting logger survive reconfiguration
_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _DropSchemaHashWarning()
)

from .types import DataType, promote
from .sinks.lake import LakeTable
from .pipelines.replay import Replayer, bootstrap_snapshot, replay_changelog

__all__ = ["DataType", "promote", "LakeTable", "Replayer", "bootstrap_snapshot", "replay_changelog"]
