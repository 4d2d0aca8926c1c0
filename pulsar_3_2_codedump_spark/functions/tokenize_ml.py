"""Tokenizer-training and feature-extraction operators (§2.N extensions).

  - **BPE merge step**: the core primitive of byte-pair-encoding tokenizer
    training — count every ADJACENT token pair across the corpus (with
    multiplicity, unlike the distinct shingles used for dedup) and rank the
    top merge candidates. One explode + one hash-agg with map-side partial
    aggregation; top-k is a TakeOrdered. Iterating this operator (merge,
    re-tokenize, repeat) is exactly public BPE training (Sennrich et al.,
    "Neural Machine Translation of Rare Words with Subword Units").
  - **Hashing-trick features** (Weinberger et al., "Feature Hashing for
    Large Scale Multitask Learning"): fixed-width sparse count vectors via
    ``hash(token) mod D`` — no vocabulary table, no global state, so the
    transform is embarrassingly parallel at any corpus size. Emitted in
    sparse (doc_id, dim, cnt) form.

All pure `pyspark.sql.functions` column expressions — JVM codegen, no
Python in the hot path. md5-derived hashes keep bit-parity with the DuckDB
oracle (xxhash64 is the production substitution — see operators/routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.functions.dedup_ml import _D_WORDS
from pulsar_3_2_codedump_spark.queries import query

BPE_TOPK = 20
HASH_DIMS = 16


@query(
    "bpe_merge_step",
    section="2.N-text",
    doc=f"One BPE training step: top-{BPE_TOPK} most frequent ADJACENT token "
    "pairs across the corpus (occurrence counts, not distinct). "
    "Explode + partial-agg shuffle + TakeOrdered.",
    oracle=f"""
        WITH w AS (SELECT doc_id, {_D_WORDS} AS ws FROM documents),
        pairs AS (
            SELECT unnest(CASE WHEN len(ws) >= 2 THEN
                       list_transform(generate_series(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i + 1])
                   ELSE [] END) AS pair
            FROM w
        )
        SELECT pair, COUNT(*) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair
        LIMIT {BPE_TOPK}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(BPE_TOPK)
    )


@query(
    "hashing_trick_features",
    section="2.N-features",
    doc=f"Hashing-trick sparse features: dim = md5(token) mod {HASH_DIMS}, "
    "count per (doc, dim). No vocabulary state — linear, one shuffle.",
    oracle=f"""
        WITH w AS (SELECT doc_id, unnest({_D_WORDS}) AS tok
                   FROM documents WHERE doc_id < 300)
        SELECT doc_id,
               CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {HASH_DIMS} AS dim,
               COUNT(*) AS cnt
        FROM w GROUP BY doc_id, dim
    """,
)
def hashing_trick_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300))
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = docs.select("doc_id", F.explode(ws).alias("tok"))
    dim = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % HASH_DIMS
    return (
        tok.select("doc_id", dim.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
