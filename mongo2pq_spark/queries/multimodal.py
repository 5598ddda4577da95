"""Multimodal-column queries: binary payload + typed metadata.

The payload is built from the documents fixture (utf-8 bytes stand in
for image/audio bytes); octet_length and md5 are portable, so the
metadata path is fully oracle-checked. The decode path (mapInPandas)
is exercised by ``multimodal_decode_features`` — its deterministic
fake features come from Python, so it carries no SQL oracle (driver
records the rows-only check) but is covered value-level in tests/.
"""

from __future__ import annotations

from mongo2pq_spark.operators import multimodal as ops
from mongo2pq_spark.queries.registry import register


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="binary payload column + typed metadata struct (mime, size, digest)",
)
def multimodal_metadata(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.media_metadata(ops.attach_payload(docs))


@register(
    "multimodal_decode_features",
    None,  # Python-side fake decoder: no SQL oracle (rows-only check)
    doc="Arrow-batched decode plumbing (mapInPandas): payload → stubbed "
        "feature vector; schema/batch contract is the real one. Output is "
        "scalarized (count + digest of the vector) so the result is "
        "hashable/sortable for any downstream canonicalizer",
)
def multimodal_decode_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    decoded = ops.decode_features(ops.attach_payload(docs))
    return decoded.select(
        "doc_id",
        "mime",
        "n_bytes",
        "payload_md5",
        F.size("feature").cast("bigint").alias("n_features"),
        F.md5(
            F.concat_ws(",", F.col("feature").cast("array<string>")).cast("binary")
        ).alias("features_md5"),
    )
