"""Privacy / data-governance operators for training-data pipelines.

A corpus pipeline that ships data to training must answer two governance
questions: *can rows be re-identified from quasi-identifiers?* (k-anonymity,
Sweeney 2002) and *what do privatized aggregates look like?* (the Laplace
mechanism, Dwork et al. 2006). Beyond-reference §2.N extensions — the
standard public formulations, expressed as partial-agg scans:

  - **k-anonymity audit**: group sizes over a quasi-identifier tuple at
    three generalization levels (full QI → drop the balance decile → nation
    only), reporting the minimum k, the rows in groups below the k=5
    threshold, and the at-risk share. One hash-agg per level over the same
    scan; all counts exact BIGINT. Generalization monotonicity (coarser QI
    ⇒ larger k_min) is the pytest invariant.
  - **Laplace-mechanism noisy counts**: per-segment counts plus
    Laplace(Δf/ε) noise derived from the inverse CDF of a deterministic
    md5 uniform — the MECHANISM is exact (scale, shape, symmetry); the
    deterministic seed is what makes the result hash-checkable across
    engines (a production deployment swaps the hash uniform for a CSPRNG
    draw — the plan is unchanged). Exact counts are emitted alongside for
    the audit; a real release would drop them.

Both are single-scan shapes — no joins beyond a broadcast stats row, no
state — so they run at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query

KANON_THRESHOLD = 5   # rows in groups smaller than this are "at risk"
KANON_DECILES = 10


@query(
    "k_anonymity_audit",
    section="2.N-privacy",
    doc="k-anonymity audit (Sweeney) over customers at three generalization "
    "levels: full quasi-identifier (nation, segment, balance decile), "
    "dropped decile, nation only. Per level: group count, minimum k, rows "
    f"in groups below k={KANON_THRESHOLD} and their share. Balance deciles "
    "are integer-cent buckets (exact on both engines); each level is one "
    "hash-agg over the same scan. The generalization ladder — coarser QI, "
    "larger k_min — is the operator a release gate walks until the "
    "threshold holds.",
    oracle=f"""
        WITH base AS (
            SELECT c_nationkey AS nation, c_mktsegment AS seg,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        ),
        st AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM base),
        q AS (
            SELECT nation, seg,
                   ((cents - st.mn) * {KANON_DECILES}) // (st.mx - st.mn + 1)
                       AS decile
            FROM base, st
        ),
        lvls AS (
            SELECT 0 AS level, CAST(nation AS VARCHAR) || '|' || seg || '|' ||
                   CAST(decile AS VARCHAR) AS qi FROM q
            UNION ALL
            SELECT 1, CAST(nation AS VARCHAR) || '|' || seg FROM q
            UNION ALL
            SELECT 2, CAST(nation AS VARCHAR) FROM q
        ),
        g AS (SELECT level, qi, COUNT(*) AS sz FROM lvls GROUP BY 1, 2)
        SELECT CAST(level AS BIGINT) AS level,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(sz) AS BIGINT) AS k_min,
               CAST(SUM(CASE WHEN sz < {KANON_THRESHOLD} THEN sz ELSE 0 END)
                    AS BIGINT) AS rows_at_risk,
               ROUND(CAST(SUM(CASE WHEN sz < {KANON_THRESHOLD} THEN sz
                                   ELSE 0 END) AS DOUBLE) / SUM(sz), 6)
                   AS risk_share
        FROM g GROUP BY level
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    base = customer.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    st = base.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    q = base.crossJoin(F.broadcast(st)).select(
        "nation", "seg",
        F.expr(f"((cents - mn) * {KANON_DECILES}) DIV (mx - mn + 1)").alias(
            "decile"
        ),
    )
    lvls = (
        q.select(
            F.lit(0).alias("level"),
            F.concat_ws(
                "|",
                F.col("nation").cast("string"),
                "seg",
                F.col("decile").cast("string"),
            ).alias("qi"),
        )
        .unionAll(
            q.select(
                F.lit(1).alias("level"),
                F.concat_ws("|", F.col("nation").cast("string"), "seg").alias("qi"),
            )
        )
        .unionAll(
            q.select(
                F.lit(2).alias("level"), F.col("nation").cast("string").alias("qi")
            )
        )
    )
    g = lvls.groupBy("level", "qi").agg(F.count(F.lit(1)).alias("sz"))
    risk = F.sum(
        F.when(F.col("sz") < KANON_THRESHOLD, F.col("sz")).otherwise(0)
    )
    return g.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("k_min"),
        risk.cast("long").alias("rows_at_risk"),
        F.round(risk.cast("double") / F.sum("sz"), 6).alias("risk_share"),
    ).select(
        F.col("level").cast("long").alias("level"),
        "n_groups", "k_min", "rows_at_risk", "risk_share",
    )


DP_EPSILON_X10 = 10  # epsilon = 1.0, carried as an integer to keep literals exact


@query(
    "dp_laplace_counts",
    section="2.N-privacy",
    doc="Laplace-mechanism privatized counts (Dwork-McSherry-Nissim-Smith): "
    "per-segment customer counts plus Laplace(Δf/ε) noise with Δf=1, "
    "ε=1.0, drawn by inverse CDF — noise = -b·sign(u-½)·ln(1-2|u-½|) — "
    "from a deterministic md5 uniform per group. The mechanism (scale, "
    "shape, symmetry) is exact; the deterministic seed is what makes the "
    "release hash-checkable across engines, and a production deployment "
    "swaps it for a CSPRNG draw with the identical plan. Exact counts "
    "ride along for the audit; a real release drops them.",
    oracle="""
        WITH g AS (
            SELECT c_mktsegment AS segment, COUNT(*) AS exact_count
            FROM customer GROUP BY 1
        ),
        u AS (
            SELECT segment, exact_count,
                   CAST(concat('0x', substr(md5(segment), 1, 13)) AS BIGINT)
                       / 4503599627370496.0 AS uni
            FROM g
        )
        SELECT segment,
               CAST(exact_count AS BIGINT) AS exact_count,
               ROUND(exact_count
                     + (-1.0) * (CASE WHEN uni >= 0.5 THEN 1 ELSE -1 END)
                       * LN(1.0 - 2.0 * ABS(uni - 0.5)), 4) AS noisy_count,
               CAST(1.0 AS DOUBLE) AS epsilon
        FROM u
    """,
)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    g = customer.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    uni = (
        F.conv(F.substring(F.md5(F.col("segment")), 1, 13), 16, 10).cast("long")
        / F.lit(float(1 << 52))
    )
    sign = F.when(uni >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.lit(-1.0) * sign * F.log(F.lit(1.0) - 2.0 * F.abs(uni - 0.5))
    return g.select(
        "segment",
        F.col("exact_count").cast("long").alias("exact_count"),
        F.round(F.col("exact_count") + noise, 4).alias("noisy_count"),
        F.lit(1.0).alias("epsilon"),
    )
