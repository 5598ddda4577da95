"""Hybrid retrieval: reciprocal-rank fusion (RRF) of a sparse (BM25)
and a dense (embedding-cosine) ranking — the standard way a modern
retrieval / data-curation stack combines its two candidate generators
(Cormack, Clarke & Buettcher, SIGIR 2009: RRF "outperforms Condorcet
and individual rank learning methods").

The reference engine (a Mongo→parquet EL tool) has no retrieval
surface; this extends the engine's LLM-pipeline side, composing the
existing BM25 scoring core (operators/text.py) with the existing
exact-cosine top-k (operators/similarity.py).

Queries are QUERY-BY-EXAMPLE ("more like this document"): each example
document's distinct tokens form its BM25 query and its embedding forms
its dense query, so both rankings are derivable from the corpus alone
— no free-text query channel needed, and the whole pipeline stays
fully SQL-oracle-checkable.

Scale shape (100 TB posture):
- ONE tokenize pass builds the tf table (cached: it feeds doc lengths,
  df, the query-term extraction AND scoring).
- The query-term table is |examples| × |distinct terms per doc| rows —
  broadcast, pruning tf before any scoring work.
- The lexical top-k is the two-phase salted window (no per-query
  partition ever ranks the full match set); the dense top-k broadcasts
  the example vectors and never shuffles the corpus.
- Fusion joins two ≤ depth·|examples|-row rankings — driver-trivial,
  executed as one broadcast-able full-outer join; the final window
  ranks ≤ 2·depth rows per query (bounded by construction, so a plain
  window is safe here — the salting lesson applies to UNBOUNDED group
  fan-in, not to pre-truncated rankings).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ex_label(id_expr: Column) -> Column:
    """Query label for an example document id: ``ex<id>``."""
    return F.concat(F.lit("ex"), id_expr.cast("string"))


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    example_ids: Sequence[int],
    depth: int = 50,
    rrf_k: int = 60,
    top_n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``top_n`` fused results per example document.

    Per example e: BM25-rank the corpus against e's distinct tokens and
    cosine-rank it against e's embedding (each to ``depth``, e itself
    excluded from both sides), then fuse over the UNION of candidates:

        rrf(d) = Σ_r 1 / (rrf_k + rank_r(d))    (absent rank ⇒ 0)

    Output: (query_id, doc_id, rrf_score, rank, lex_rank, dense_rank)
    with rrf_score rounded to 9 dp before ranking and ties broken on
    doc_id — the engine-portable ordering contract. lex_rank /
    dense_rank are NULL for candidates only one side surfaced.
    """
    from mongo2pq_spark.functions.textfns import tokens
    from mongo2pq_spark.operators.joins import salted_topk
    from mongo2pq_spark.operators.similarity import cosine_topk
    from mongo2pq_spark.operators.text import bm25_scores

    ids = list(example_ids)

    # -- sparse side: BM25 against each example's distinct tokens ----
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # tf is unique per (doc, term), so the example rows ARE the
    # distinct query-term table
    qterms = (
        tf.filter(F.col(id_col).isin(ids))
        .select(_ex_label(F.col(id_col)).alias("query_id"), "term")
    )
    scored = bm25_scores(tf, qterms, id_col=id_col).filter(
        # query-by-example excludes the example itself
        F.col("query_id") != _ex_label(F.col(id_col))
    )
    lex = salted_topk(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col(id_col)],
        depth,
        salt_src=F.col(id_col),
    ).select(
        "query_id",
        F.col(id_col).alias("doc_id"),
        F.col("rank").alias("lex_rank"),
    )

    # -- dense side: exact cosine against each example's embedding ---
    qvecs = emb.filter(F.col(vec_id_col).isin(ids))
    dense = cosine_topk(
        emb, qvecs, k=depth, id_col=vec_id_col, vec_col=vec_col
    ).select(
        _ex_label(F.col("query_id")).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )

    # -- fuse --------------------------------------------------------
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (F.col("lex_rank") + F.lit(rrf_k)), F.lit(0.0))
        + F.coalesce(
            1.0 / (F.col("dense_rank") + F.lit(rrf_k)), F.lit(0.0)
        ),
        9,
    )
    # bounded window: ≤ 2·depth candidates per query by construction
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            "rank",
            "lex_rank",
            "dense_rank",
        )
    )
