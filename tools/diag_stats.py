"""Diagnose stats_summary hash mismatch: compare Spark vs DuckDB column-wise."""
import duckdb
import sys, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

sf = "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from pulsar_3_2_codedump_spark.queries import load_all

q = load_all()["stats_summary"]
sdf = q.fn(spark, sf).orderBy("l_returnflag").toPandas()

con = duckdb.connect()
for t in ["lineitem"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
odf = con.execute(q.oracle + " ORDER BY l_returnflag").df()

print("SPARK:")
print(sdf.to_string())
print("ORACLE:")
print(odf.to_string())
for c in sdf.columns:
    if c in odf.columns:
        diff = (sdf[c] != odf[c])
        if diff.any():
            print(f"MISMATCH col={c}")
            print("  spark :", sdf[c].tolist())
            print("  oracle:", odf[c].tolist())
