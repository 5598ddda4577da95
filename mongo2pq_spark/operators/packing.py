"""Sequence packing for LLM training-data preparation.

Training consumes fixed-length token sequences (e.g. 2048); packing
short documents into shared sequences instead of padding each one is
the standard throughput lever. This operator assigns every document to
a (shard, bin) so that concatenating a bin's documents in order fills
one training sequence, next-fit style: documents are laid out end to
end in a deterministic order and a document belongs to the bin where it
STARTS — a document straddling a boundary continues into the next bin,
the packed-sequence-with-attention-masking regime.

Scale shape: a single global order would serialize the corpus, so
documents are first hash-sharded (md5 of the id — deterministic,
engine-portable); the running token total is a window over the shard.
``n_shards`` is a free parameter scaled to the cluster (4096+ at
100 TB so each shard's window sort handles corpus/n_shards rows) —
unlike a data-fixed low-cardinality key, the parallelism here is
chosen, not inherited. Output is one row per bin: document count,
token count, and fill ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import token_hash32

DEFAULT_SEQ_LEN = 2048
DEFAULT_SHARDS = 32


def token_pack_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str | None = None,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Per-(shard, bin) packing summary; see module docstring."""
    from pyspark.sql import Window

    from mongo2pq_spark.operators.text import BPE_ISH_PATTERN

    pattern = token_pattern or BPE_ISH_PATTERN
    n_tok = F.regexp_count(F.col(text_col), F.lit(pattern)).cast("bigint")
    sharded = df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        (token_hash32(F.col(id_col).cast("string")) % n_shards).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    placed = sharded.select(
        "shard",
        "n_tok",
        # bin of the document's STARTING offset in the shard's layout
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(seq_len))
        ).alias("bin_id"),
    )
    return (
        placed.groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .select(
            "shard",
            "bin_id",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.lit(float(seq_len)), 6).alias(
                "fill_ratio"
            ),
        )
    )
