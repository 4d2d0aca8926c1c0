"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given sf,
then compares row count, column names, and order-insensitive values
(floats canonicalized to 9 significant digits — stricter than any sane
driver hash, so passing here should pass there).

It ALSO checks the oracle's DuckDB output types (via DESCRIBE — no extra
execution) and fails when a column leaves as HUGEINT or DECIMAL while the
Spark column is not DecimalType. DuckDB silently widens BIGINT SUM/COUNT
(and derived arithmetic like ``window_sum // k``) to HUGEINT, which exits
Arrow as decimal128(38,0); Python ``fetchall()`` canonicalizes HUGEINT to
plain int so the value compare below CANNOT see the divergence, but the
driver hashes the Arrow types and records a hash mismatch (r9:
segment_compaction_plan.bin_id). tests/test_oracle_arrow_schemas.py is
the Arrow-level (executed) form of the same guard over every oracle.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pulsar_3_2_codedump_spark.catalog import TABLES, release_shared_frames
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            # the driver's hash distinguishes IEEE -0.0 from +0.0 (r1 lesson)
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        return f"{v:.9g}"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def decimal_drift(spark_schema, duck_described) -> list[str]:
    """Oracle columns whose DuckDB type is HUGEINT/DECIMAL (→ Arrow
    decimal128) while the Spark column is not DecimalType — the
    uncast-HUGEINT class the value compare cannot see (the driver's
    Arrow-level hash can). ``duck_described`` is DESCRIBE output rows."""
    from pyspark.sql.types import DecimalType

    spark_types = {f.name: f.dataType for f in spark_schema.fields}
    out = []
    for name, dtype, *_ in duck_described:
        if (
            dtype == "HUGEINT" or dtype.startswith("DECIMAL")
        ) and not isinstance(spark_types.get(name), DecimalType):
            out.append(
                f"oracle col {name} is DuckDB {dtype} (Arrow decimal128) but "
                f"spark is {spark_types.get(name)} — uncast HUGEINT? CAST it "
                f"to BIGINT in the oracle"
            )
    return out


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_noracle = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        # shared DISK_ONLY frames have a per-query lifecycle (ADVICE r13):
        # release the previous query's before building this one, so a
        # byte-identical cached fragment never hides a plan/scan regression
        # in a 271-query sweep and blocks don't accumulate unboundedly.
        release_shared_frames()
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"NOOR {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s) [rows-only check]")
            n_noracle += 1
            continue
        try:
            described = con.execute(f"DESCRIBE {q.oracle}").fetchall()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        problems += decimal_drift(sdf.schema, described)
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
