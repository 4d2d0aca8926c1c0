"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real implementation lives in the ``pulsar_3_2_codedump_spark`` package;
this module is only the registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulsar_3_2_codedump_spark.queries import load_all  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the Pulsar spine — envelope the events log,
    compact it to latest-value-per-key (TableView), per-partition stats."""
    from pulsar_3_2_codedump_spark.queries import REGISTRY

    load_all()
    return REGISTRY["tableview_latest"].fn(spark, SF_SMOKE)


def _with_frame_release(fn):
    """Shared DISK_ONLY frames have a per-query lifecycle (ADVICE r13):
    release the PREVIOUS query's frames before building the next, so the
    driver's 50-query sweep never splices one query's cached fragment into
    another's plan and blocks don't accumulate across the session."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pulsar_3_2_codedump_spark.catalog import release_shared_frames

        release_shared_frames()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_frame_release(q.fn) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
