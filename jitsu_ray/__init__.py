"""jitsu_ray: a Ray-Data-native CDC / incremental-ingest engine.

Brand-new implementation of the query/data-processing capabilities of
the reference (antonefremov/jitsu, an EventNative snapshot) re-targeted
as a batch-replayable CDC engine over Parquet tables of source code,
per BASELINE.json. See SURVEY.md for the operator-by-operator mapping.
"""

from .types import DataType, promote
from .sinks.lake import LakeTable
from .pipelines.replay import Replayer, replay_changelog

__all__ = ["DataType", "promote", "LakeTable", "Replayer", "replay_changelog"]
