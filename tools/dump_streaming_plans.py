"""Dump the per-micro-batch physical plans of the streaming query families
that share optimized batch kernels (VERDICT r16 next-round item 8).

The streaming queries build their per-batch frames inside foreachBatch
closures, so `explain` cannot reach them from the registered callable; this
tool reconstructs each family's batch plan with a static stand-in batch
frame using the SAME module functions the closure calls, and dumps
`explain("formatted")` to plans/<tag>/streaming_<family>_batchplan.txt.
Families:

  - ann_serving: the per-batch candidate scoring plan of
    streaming_ann_serving — static index av (corpus + cell + e_norm, the
    r17 norm-precompute layout) probed by a bounded arriving-query frame;
    the dump should show dot/(q_norm*e_norm) with NO per-pair norm folds,
    broadcasts on the batch side only.
  - minhash_ivm: streaming_minhash_signature_ivm's per-batch signature
    projection (the shared shingle -> one-md5-pass -> affine-rehash kernel
    of minhash_lsh_dedup) and its keep-latest merge window.

Usage: python tools/dump_streaming_plans.py [tag]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from pulsar_3_2_codedump_spark.catalog import load, persist_shared_corpus_frame
from pulsar_3_2_codedump_spark.session import get_spark

SF = "/root/testdata/sf0.1"
TAG = sys.argv[1] if len(sys.argv) > 1 else "r17"


def dump(df, name: str) -> None:
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG
    )
    os.makedirs(outdir, exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"streaming_{name}_batchplan.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}", flush=True)


def ann_serving_batch_plan(spark):
    """The serve() closure's cand frame, verbatim, against a static batch."""
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQIVF_NPROBE,
        _argmin_cell,
        _ivf_cells,
        _query_pred,
        dot,
        l2_norm,
    )
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import ANN_SERVE_K

    emb = load(spark, SF, "embeddings")
    cells = _ivf_cells(emb)
    av = persist_shared_corpus_frame(
        emb.join(_argmin_cell(emb, cells, "vec_id", 1), "vec_id")
        .withColumn("e_norm", l2_norm(F.col("embedding")))
    )
    # stand-in for one micro-batch's arriving query ids (gen-1 predicate)
    batch = (
        emb.filter(_query_pred())
        .filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    qv = F.broadcast(batch).join(
        av.select(
            "vec_id", F.col("embedding").alias("q_emb"),
            F.col("e_norm").alias("q_norm"),
        ),
        batch.query_id == F.col("vec_id"),
    ).select("query_id", "q_emb", "q_norm")
    probe = _argmin_cell(
        qv.select(
            F.col("query_id").alias("vec_id"),
            F.col("q_emb").alias("embedding"),
        ),
        cells,
        "vec_id",
        PQIVF_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), "cell_id")
    cand = (
        F.broadcast(probe.join(qv, "query_id"))
        .join(av, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("e_norm")),
        )
        .withColumn("neighbor_id", F.col("vec_id"))
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= ANN_SERVE_K)
        .select(
            "query_id",
            F.lit(1).cast("int").alias("gen"),
            F.col("rnk").cast("long").alias("rnk"),
            "neighbor_id",
        )
    )
    return cand


def minhash_ivm_batch_plan(spark):
    """batch_sig + merge_latest, verbatim, against a static doc batch."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        base_hashes,
        minhash_signature,
        shingles,
    )
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import (
        MINHASH_IVM_DOCS,
    )

    docs = load(spark, SF, "documents").filter(F.col("doc_id") < MINHASH_IVM_DOCS)
    batch = docs.select(
        "doc_id", F.col("doc_id").cast("long").alias("ver"), "text"
    )
    sig = batch.select(
        "doc_id",
        "ver",
        *minhash_signature(base_hashes(shingles(F.col("text")))),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("ver"))
    return (
        sig.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def main() -> None:
    spark = get_spark("dump_streaming_plans")
    dump(ann_serving_batch_plan(spark), "ann_serving")
    dump(minhash_ivm_batch_plan(spark), "minhash_ivm")


if __name__ == "__main__":
    main()
