"""Query registry — the single source of truth the driver consumes.

Every implemented operator from SURVEY.md §2 registers here with
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame/SQL)
  - an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
    parquet fixtures (or ``None`` for genuinely non-SQL-expressible ops —
    the driver then records a weaker rows-only check).

Conventions (to survive the driver's order-insensitive value-hash compare):
  - every computed column is aliased identically on both sides
  - floating aggregates are rounded identically on both sides
  - window orderings always include a unique tiebreaker column
  - timestamps in output are formatted to strings identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    section: str = ""  # SURVEY §2 item, e.g. "2.D1"
    doc: str = ""
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, section: str = "", doc: str = "", tags=None):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, section, doc or (fn.__doc__ or ""), tags or [])
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every module that registers queries, then return the registry."""
    from pulsar_3_2_codedump_spark.operators import (  # noqa: F401
        advanced,
        compaction,
        dedup,
        relational,
        routing,
        skew,
        timeops,
        windows,
    )
    from pulsar_3_2_codedump_spark.functions import (  # noqa: F401
        dedup_ml,
        multimodal,
        similarity,
        text,
    )
    from pulsar_3_2_codedump_spark.operators import delivery  # noqa: F401
    from pulsar_3_2_codedump_spark.streaming import queries_streaming  # noqa: F401

    return REGISTRY
