"""Guard against the uncast-HUGEINT oracle class (VERDICT r9).

DuckDB silently widens SUM/COUNT over BIGINT — and any arithmetic derived
from such a window sum (``cum // k``) — to HUGEINT, which leaves Arrow as
decimal128(38,0) while the Spark side emits int64. Python ``fetchall()``
canonicalizes HUGEINT to plain int, so the value-compare gate CANNOT see
the divergence, but the driver hashes at the Arrow level and records a
hash mismatch (r9: segment_compaction_plan.bin_id was exactly this).

This test runs EVERY registered oracle on DuckDB at sf0.001 and asserts no
output column is an Arrow decimal type. If a future query intentionally
emits decimals (with a matching Spark DecimalType), add it to
ALLOWED_DECIMAL below with the column name.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

duckdb = pytest.importorskip("duckdb")

from pulsar_3_2_codedump_spark.catalog import TABLES
from pulsar_3_2_codedump_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

# (query_name, column_name) pairs where a decimal oracle output is
# intentional AND the Spark result schema is DecimalType for that column.
ALLOWED_DECIMAL: set[tuple[str, str]] = set()


def test_no_oracle_column_leaves_duckdb_as_decimal():
    registry = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders = []
    for name, q in sorted(registry.items()):
        if q.oracle is None:
            continue
        schema = con.execute(q.oracle).fetch_arrow_table().schema
        for field in schema:
            if pa.types.is_decimal(field.type) and (
                (name, field.name) not in ALLOWED_DECIMAL
            ):
                offenders.append(f"{name}.{field.name}: {field.type}")
    assert not offenders, (
        "oracle columns leave DuckDB as Arrow decimal (uncast HUGEINT? "
        "CAST to BIGINT in the oracle, or allowlist if the Spark side is "
        f"genuinely DecimalType): {offenders}"
    )
