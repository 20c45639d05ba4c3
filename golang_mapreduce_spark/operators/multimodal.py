"""Multimodal-column operators — treat media as opaque ``binary`` columns
with typed metadata, the pattern a 100 TB multimodal training pipeline
uses (BASELINE.json north star; nothing comparable exists in the
reference, whose only value type is string, worker.go:19-22).

The fixtures carry no real media, so the *bytes* are deterministic fakes
(UTF-8 encoding of the text column) while all Spark-side plumbing —
binary columns, typed metadata structs, Arrow-batched ``mapInPandas``
decode/feature-extract with a stubbed decoder — is real and tested.
Real decoders (PIL/ffmpeg) are not in this container; ``decode_image``
raises NotImplementedError unless ``fake=True``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.sources.fixtures import load_table


def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id: one row per document
    with text metadata + typed embedding stats (dim, rounded L2 norm,
    label).  Equality join on the id — bucket both tables by id at scale
    and this joins shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size("emb").alias("emb_dim"),
            F.round(
                F.expr("sqrt(aggregate(emb, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"),
                6,
            ).alias("emb_norm"),
            "label",
        )
    )


MULTIMODAL_JOIN_SQL = """
SELECT doc_id, lang, n_chars,
       len(e.embedding) AS emb_dim,
       ROUND(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v))), 6) AS emb_norm,
       e.label
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
"""


def media_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary handling: byte length and content hash of the media
    blob (deterministic fake: UTF-8 bytes of text).  Byte length differs
    from character length exactly when multibyte content appears — the
    distinction a media pipeline must preserve."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.lit("text/plain").alias("mime"),
    )


MEDIA_BLOB_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       'text/plain' AS mime
FROM documents
"""


# --- stubbed decode / feature extraction (rows-only check) --------------

def decode_image(data: bytes, fake: bool = False) -> dict:
    """Decode an image blob to pixel features.  Real decoding requires an
    image library not present in this container; the deterministic fake
    derives 'pixel' statistics from the raw bytes so the full pipeline
    (binary column → Arrow batch → feature row) is exercised."""
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv; pass fake=True for the "
            "deterministic byte-derived stand-in"
        )
    head = data[:64]
    return {
        "width": 1 + (len(data) % 512),
        "height": 1 + (len(data) // 512),
        "mean_byte": float(sum(head)) / max(len(head), 1),
    }


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, mean_byte double"
)


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the (fake) media blobs:
    binary column in, one typed feature row out per blob, Arrow-batched.
    This is the exact harness a real decoder drops into (swap
    ``fake=True`` for the real decode)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                feats = decode_image(data, fake=True)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_byte": feats["mean_byte"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(extract, schema=FEATURE_SCHEMA)


QUERIES = {
    "multimodal_join": multimodal_join,
    "media_blob_stats": media_blob_stats,
    "image_features": image_features,
}

# image_features is python-side feature extraction — not SQL-expressible;
# the driver records a rows-only check for it (tests assert its values
# against an independent python computation instead).
ORACLES = {
    "multimodal_join": MULTIMODAL_JOIN_SQL,
    "media_blob_stats": MEDIA_BLOB_SQL,
}
