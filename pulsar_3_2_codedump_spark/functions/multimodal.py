"""Multimodal columns: opaque binary payloads + typed metadata (SURVEY §2.N).

Pattern: image/audio/video live as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode libraries (PIL/ffmpeg/...) are NOT in this
container, so the decode kernel is stubbed behind ``MediaDecodeUnavailable`` /
a deterministic fake — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested (tests/test_multimodal.py).

Scale posture: binary payloads ride parquet pages; metadata-only queries never
touch the blob column (column pruning); decode stages are sized by
``spark.sql.files.maxPartitionBytes`` so an Arrow batch of blobs fits executor
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class MediaDecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: image/audio libs absent in this env."""


def decode_image(blob: bytes):  # pragma: no cover - real path needs PIL
    raise MediaDecodeUnavailable(
        "image decode requires PIL/opencv (not in container); "
        "use extract_features(deterministic_fake=True) for the tested fake path"
    )


def as_media_table(docs: DataFrame) -> DataFrame:
    """Model documents as a media table: utf-8 blob + typed metadata struct."""
    blob = F.to_binary(F.col("text"), F.lit("utf-8"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over blobs (mapInPandas).

    The fake kernel is deterministic (byte statistics) so tests can assert
    exact values; the real kernel raises MediaDecodeUnavailable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                decode_image(b"")
            feats = []
            for blob in pdf["blob"]:
                b = bytes(blob)
                n = len(b)
                mean = float(sum(b) / n) if n else 0.0
                feats.append(
                    {
                        "n_bytes": n,
                        "byte_mean": mean,
                        "feature": [float(n % 256), mean, float(b[0]) if n else 0.0],
                    }
                )
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


@query(
    "multimodal_metadata",
    section="2.N-mm",
    doc="Metadata-only scan of the media table: blob sizes per format WITHOUT reading "
    "blobs into Python (column pruning keeps the binary column out of the scan "
    "for the byte-size stats — they live in the metadata struct).",
    oracle="""
        SELECT 'text/plain' AS format, COUNT(*) AS n_media,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents"))
    return media.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@query(
    "multimodal_features",
    section="2.N-mm",
    doc="Arrow-batched blob feature extraction (mapInPandas, deterministic fake "
    "kernel): per-media byte stats — the real decode swaps in behind the same "
    "schema/batch shape.",
    oracle="""
        -- fixture text is pure ASCII, so byte values == ascii codes
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               ROUND(list_aggregate(list_transform(generate_series(1, length(text)),
                     i -> ascii(substr(text, i, 1))), 'sum') * 1.0 / length(text), 4)
                   AS byte_mean
        FROM documents WHERE doc_id < 100
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents")).filter(F.col("media_id") < 100)
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean"))


def frame_sample(media: DataFrame, frame_bytes: int = 64, every: int = 3) -> DataFrame:
    """Frame sampling over opaque media blobs (the video frame-sample stage):
    the blob is windowed into fixed-size frames and every ``every``-th frame
    is kept — (media_id, frame_idx, n_bytes, checksum) out. Arrow-batched
    ``mapInPandas``; with ffmpeg present the same kernel shape decodes real
    frames behind an identical schema. Deterministic byte-window fake =
    exact-oracle testable."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("checksum", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append((int(mid), i, len(fr), int(sum(fr))))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "n_bytes", "checksum"])

    return media.mapInPandas(kernel, out_schema)


def resize_bytes(media: DataFrame, stride: int = 4) -> DataFrame:
    """Nearest-neighbor 'resize' in byte space: keep every ``stride``-th byte
    of the blob (1-D stand-in for image downsampling; PIL swaps in behind the
    same signature). Returns the resized blob + its metadata."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("checksum", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                small = bytes(blob)[::stride]
                rows.append((int(mid), small, len(small), int(sum(small))))
            yield pd.DataFrame(rows, columns=["media_id", "blob", "n_bytes", "checksum"])

    return media.mapInPandas(kernel, out_schema)


@query(
    "multimodal_frame_sample",
    section="2.N-mm",
    doc="Frame sampling (video frame-sample stage shape): 64-byte frames, "
    "every 3rd kept; per-frame byte checksum. The Arrow-batched kernel is the "
    "real plumbing; DuckDB reproduces it with substring windows over the "
    "encoded text, so any frame-boundary or sampling defect breaks the hash.",
    oracle="""
        -- windows the utf-8 BYTES (hex-pair arithmetic), exactly like the
        -- kernel — char-based substr would diverge on any multibyte text
        WITH b AS (
            SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents WHERE doc_id < 50
        ),
        frames AS (
            SELECT media_id, hx, nb,
                   UNNEST(list_filter(generate_series(0,
                        CAST(CEIL(nb / 64.0) AS BIGINT) - 1),
                        i -> i % 3 = 0)) AS frame_idx
            FROM b
        )
        SELECT media_id, frame_idx,
               CAST(LEAST(64, nb - frame_idx * 64) AS BIGINT) AS n_bytes,
               CAST(list_aggregate(list_transform(
                        generate_series(1, LEAST(64, nb - frame_idx * 64)),
                        i -> CAST(('0x' || substr(hx, (frame_idx * 64 + i - 1) * 2 + 1, 2)) AS BIGINT)),
                    'sum') AS BIGINT) AS checksum
        FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents")).filter(F.col("media_id") < 50)
    return frame_sample(media, frame_bytes=64, every=3)


PH_BITS = 32   # aHash width
PH_BANDS = 4   # 8-bit bands; hamming <= PH_HAM pairs MUST share a band
PH_HAM = 3     # pigeonhole: 3 differing bits cannot touch all 4 bands

_PH_SPARK = (
    "aggregate(transform(sequence(0, 31), i -> CASE WHEN "
    "aggregate(slice(codes, i*w+1, w), CAST(0 AS BIGINT), (a, x) -> a + x) * n "
    "> tot * greatest(0, least(w, n - i*w)) "
    "THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END), "
    "CAST(0 AS BIGINT), (a, x) -> a + x)"
)


@query(
    "phash_banded_neardup",
    section="2.N-mm",
    doc="Perceptual-hash near-duplicate detection over the media table — the "
    "image-dedup pipeline stage, run on the opaque byte stream since real "
    "decode is env-blocked (with PIL the SAME expressions run over pixel "
    f"luma): a {PH_BITS}-bit average-hash (bit i = stripe-i byte sum * n > "
    "total sum * stripe length — exact integer cross-multiplication, no "
    "division) is banded into four 8-bit keys, candidates share a band "
    f"(PIGEONHOLE-sound for hamming <= {PH_HAM}: 3 differing bits cannot "
    "touch all 4 bands), and candidates are verified with "
    "bit_count(xor). The hash builds entirely in whole-stage codegen "
    "(transform/aggregate over the char array — no Python), and the "
    "banded equi-join bounds the candidate space exactly like MinHash "
    "banding does for Jaccard.",
    oracle=f"""
        WITH c AS (
            SELECT doc_id AS media_id,
                   list_transform(string_split(text, ''), ch -> ascii(ch))
                       AS codes,
                   length(text) AS n
            FROM documents
        ),
        hh AS (
            SELECT media_id, n, (n + 31) // 32 AS w,
                   list_aggregate(codes, 'sum') AS tot, codes
            FROM c
        ),
        ph AS (
            SELECT media_id,
                   list_aggregate(list_transform(generate_series(0, 31), i ->
                       CASE WHEN COALESCE(list_aggregate(
                                     codes[i*w+1 : least((i+1)*w, n)], 'sum'),
                                 0) * n
                                 > tot * greatest(0, least(w, n - i*w))
                            THEN (CAST(1 AS BIGINT) << i) ELSE 0 END),
                       'sum') AS ph
            FROM hh
        ),
        bands AS (
            SELECT media_id, ph, j, (ph // (CAST(1 AS BIGINT) << (8 * j))) % 256
                       AS band
            FROM ph, UNNEST([0, 1, 2, 3]) AS t(j)
        ),
        cand AS (
            SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                   a.ph AS ph_a, b.ph AS ph_b
            FROM bands a JOIN bands b
              ON a.j = b.j AND a.band = b.band AND a.media_id < b.media_id
        )
        SELECT media_a, media_b,
               CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(ph_a, ph_b)) <= {PH_HAM}
    """,
)
def phash_banded_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr("transform(split(text, ''), ch -> ascii(ch))").alias("codes"),
        F.length("text").alias("n"),
    )
    hh = c.select(
        "media_id", "codes", "n",
        F.expr("(n + 31) div 32").alias("w"),
        F.expr(
            "aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("tot"),
    )
    ph = hh.select("media_id", F.expr(_PH_SPARK).alias("ph"))
    bands = ph.select(
        "media_id", "ph",
        F.explode(F.expr("sequence(0, 3)")).alias("j"),
    ).withColumn(
        "band", F.expr("(ph DIV shiftleft(CAST(1 AS BIGINT), 8 * j)) % 256")
    )
    a = bands.select(
        F.col("media_id").alias("media_a"), F.col("ph").alias("ph_a"), "j", "band"
    )
    b = bands.select(
        F.col("media_id").alias("media_b"), F.col("ph").alias("ph_b"), "j", "band"
    )
    cand = (
        a.join(b, ["j", "band"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= PH_HAM)
        .select("media_a", "media_b", "hamming")
    )


@query(
    "multimodal_resize_stats",
    section="2.N-mm",
    doc="Byte-space 'resize' (nearest-neighbor downsample — the image-resize "
    "stage shape; PIL swaps in behind the same mapInPandas signature): "
    "keep every 4th byte, emit the resized length and byte checksum per "
    "media. DuckDB reproduces the strided selection with hex-pair "
    "arithmetic over the encoded bytes, so any stride/offset defect in "
    "the Arrow kernel breaks the hash. Blob column pruned from the "
    "output so the compare is on the deterministic stats.",
    oracle="""
        WITH b AS (
            SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents WHERE doc_id < 100
        )
        SELECT media_id,
               CAST(CEIL(nb / 4.0) AS BIGINT) AS n_bytes,
               CAST(list_aggregate(list_transform(
                        generate_series(0, CAST(CEIL(nb / 4.0) AS BIGINT) - 1),
                        j -> CAST(('0x' || substr(hx, j * 8 + 1, 2)) AS BIGINT)),
                    'sum') AS BIGINT) AS checksum
        FROM b
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load(spark, sf_dir, "documents")).filter(
        F.col("media_id") < 100
    )
    return resize_bytes(media, stride=4).select("media_id", "n_bytes", "checksum")
