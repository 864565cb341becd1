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

from .types import DataType, promote
from .sinks.lake import LakeTable
from .pipelines.replay import Replayer, replay_changelog

__all__ = ["DataType", "promote", "LakeTable", "Replayer", "replay_changelog"]
