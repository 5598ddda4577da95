"""Text-analysis queries over the documents table."""

from __future__ import annotations

from mongo2pq_spark.functions.hashing import sql_hash64, sql_token_hash32
from mongo2pq_spark.functions.textfns import (
    STOPWORDS,
    sql_stopword_hits,
    sql_tokens,
    sql_word_shingles,
)
from mongo2pq_spark.operators import text as ops
from mongo2pq_spark.queries.registry import register
from mongo2pq_spark.sources.staging import generation_tmp_dir

_BPE_SQL_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len({sql_tokens('text')}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')) AS n_bpeish_tokens
    FROM documents
    """,
    doc="token counting: whitespace tokens + BPE-ish regex tokens",
)
def text_token_stats(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.token_stats(docs)


@register(
    "text_quality_scores",
    f"""
    WITH t AS (
        SELECT doc_id, text, {sql_tokens('text')} AS toks,
               length(text) AS n_chars,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               round({sql_stopword_hits('toks', STOPWORDS['en'])}
                     * 1.0 / greatest(len(toks), 1), 6) AS stopword_ratio,
               round(n_alpha * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
               round(least(n_chars / 500.0, 1.0), 6) AS len_score
        FROM t
    )
    SELECT doc_id, n_tokens, stopword_ratio, alpha_ratio, len_score,
           round((len_score + alpha_ratio
                  + round(least(stopword_ratio / 0.3, 1.0), 6)) / 3.0, 6) AS quality
    FROM feats
    """,
    doc="quality scoring: length/stopword/alpha-ratio composite in [0,1]",
)
def text_quality_scores(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.quality_scores(docs)


def _lang_id_sql() -> str:
    langs = list(STOPWORDS)
    hits = ",\n               ".join(
        f"{sql_stopword_hits('toks', STOPWORDS[lang])} AS hits_{lang}"
        for lang in langs
    )
    mx = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    first_match = " ".join(
        f"WHEN hits_{lang} = {mx} THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    scored AS (
        SELECT doc_id,
               {hits}
        FROM t
    )
    SELECT doc_id,
           CASE WHEN {mx} = 0 THEN 'und' {first_match} END AS predicted_lang,
           {mx} AS stopword_hits
    FROM scored
    """


@register(
    "text_language_id",
    _lang_id_sql(),
    doc="stopword-voting language ID (first language attaining the max wins; "
        "0 hits → 'und')",
)
def text_language_id(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.language_id(docs)


@register(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents),
    docfreq AS (
        SELECT term, ln((n.n_docs + 1.0) / (count(*) + 1.0)) + 1.0 AS idf
        FROM tf, n GROUP BY term, n.n_docs
    ),
    scored AS (
        SELECT tf.doc_id, tf.term, round(tf.tf * docfreq.idf, 6) AS tfidf
        FROM tf JOIN docfreq ON tf.term = docfreq.term
    )
    SELECT doc_id, term, tfidf, rank FROM (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    doc="TF-IDF vectorization: top-3 terms per doc by smoothed tf-idf "
        "(two shuffles; df table broadcast)",
)
def text_tfidf_top_terms(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.tfidf_top_terms(docs)


@register(
    "text_top_bigrams",
    f"""
    WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
    bigrams AS (
        SELECT unnest(CASE WHEN len(t) >= 2
               THEN [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]
               ELSE [] END) AS bigram
        FROM toks
    )
    SELECT bigram, count(*) AS n FROM bigrams
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
    doc="corpus-wide bigram frequency profile (top 20, deterministic tiebreak)",
)
def text_top_bigrams(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.textfns import tokens, word_shingles
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "text_fingerprints",
    f"""
    WITH n AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents
    )
    SELECT doc_id, {sql_hash64('norm')} AS fingerprint,
           length(norm) AS n_chars_normalized
    FROM n
    """,
    doc="60-bit content fingerprint over normalized text",
)
def text_fingerprints(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.fingerprints(docs)


@register(
    "text_winnow_fingerprints",
    f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, {sql_word_shingles('t', 3)} AS s FROM toks
    ),
    pos AS (
        SELECT doc_id,
               unnest(s) AS shingle,
               generate_subscripts(s, 1) - 1 AS pos
        FROM sh
    ),
    h AS (
        SELECT doc_id, pos, {sql_token_hash32('shingle')} AS h FROM pos
    ),
    wm AS (
        SELECT doc_id, pos,
               min(h) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
               ) AS win_min,
               count(*) OVER (PARTITION BY doc_id) AS n_shingles
        FROM h
    )
    SELECT DISTINCT doc_id, win_min AS fingerprint
    FROM wm WHERE pos <= n_shingles - 4
    """,
    doc="MOSS-style winnowing fingerprints: distinct min shingle-hash per "
        "sliding window of 4 shingles — any shared run of ≥ 6 tokens shares "
        "a fingerprint (sub-document near-dup / provenance primitive)",
)
def text_winnow_fingerprints(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.winnow_fingerprints(docs, shingle_n=3, window=4)


@register(
    "text_clean",
    r"""
    WITH c AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '<[^>]{1,256}>', ' ', 'g'),
                       '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'),
                   '\s+', ' ', 'g')) AS clean_text
        FROM documents
    )
    SELECT doc_id, clean_text,
           length(text) AS n_chars_raw,
           length(clean_text) AS n_chars_clean
    FROM c
    """,
    doc="corpus cleaning projection: strip HTML-ish tags, drop control "
        "chars, collapse whitespace — one narrow codegen pass, with "
        "before/after lengths for shrinkage auditing",
)
def text_clean(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.clean_text(docs)


_BENCH_FILTER = "doc_id % 100 = 0"


@register(
    "text_decontaminate",
    f"""
    WITH bench AS (SELECT text FROM documents WHERE {_BENCH_FILTER}),
    btoks AS (SELECT {sql_tokens('text')} AS t FROM bench),
    bsh AS (
        SELECT DISTINCT {sql_token_hash32('s')} AS h
        FROM (SELECT unnest(list_distinct({sql_word_shingles('t', 3)})) AS s FROM btoks)
    ),
    dtoks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
    dsh AS (
        SELECT doc_id, {sql_token_hash32('s')} AS h
        FROM (SELECT doc_id, unnest(list_distinct({sql_word_shingles('t', 3)})) AS s FROM dtoks)
    ),
    ov AS (
        SELECT doc_id, count(*) AS bench_overlap FROM dsh
        WHERE h IN (SELECT h FROM bsh)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(ov.bench_overlap, 0) AS BIGINT) AS bench_overlap,
           coalesce(ov.bench_overlap, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN ov ON ov.doc_id = d.doc_id
    """,
    doc="benchmark decontamination: flag training docs sharing ≥2 distinct "
        "3-gram shingles with any benchmark text (deterministic fixture "
        "stand-in: every 100th doc is 'benchmark') — the test-set-leakage "
        "guard; shingle equi-join against the small benchmark build side",
)
def text_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select("text")
    return ops.decontaminate_flags(docs, bench, min_overlap=2)


@register(
    "text_boilerplate_ngrams",
    f"""
    WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct({sql_word_shingles('t', 3)})) AS s
        FROM toks
    )
    SELECT {sql_token_hash32('s')} AS shingle_hash,
           count(DISTINCT doc_id) AS n_docs
    FROM sh
    GROUP BY 1
    HAVING count(DISTINCT doc_id) >= 5
    """,
    doc="cross-document boilerplate detection (the C4 line-dedup signal "
        "at shingle granularity): 3-gram shingles appearing in ≥5 "
        "DISTINCT documents, with their document frequency — exactly "
        "the set a line/template-removal pass strips. One explode of "
        "per-doc distinct shingles → one distinct-count aggregation "
        "keyed by the high-cardinality shingle hash (map-side "
        "combinable); no joins, no windows",
)
def text_boilerplate_ngrams(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.hashing import token_hash32
    from mongo2pq_spark.functions.textfns import tokens, word_shingles
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), 3))
        ).alias("s"),
    ).select("doc_id", token_hash32(F.col("s")).alias("shingle_hash"))
    return (
        sh.groupBy("shingle_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 5)
    )


@register(
    "text_zipf_slope",
    f"""
    WITH toks AS (
        SELECT unnest({sql_tokens('text')}) AS term FROM documents
    ),
    freq AS (SELECT term, count(*) AS f FROM toks GROUP BY term),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r
        FROM freq
        ORDER BY f DESC, term
        LIMIT 1000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6)
               AS zipf_slope,
           round(regr_r2(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6)
               AS zipf_r2
    FROM ranked
    """,
    doc="Zipf fit over the vocabulary: OLS slope (and R²) of ln(freq) "
        "vs ln(rank) for the top-1000 terms — natural corpora fit "
        "slope ≈ −1, so a far-off slope flags synthetic/degenerate "
        "text. Term freqs are one map-combinable aggregation; the "
        "global rank is a TOP-K (orderBy+limit — per-partition top-k "
        "then merge, never a full single-partition sort), and the "
        "regression runs on 1000 rows; ties broken by term so the "
        "rank is deterministic",
)
def text_zipf_slope(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.textfns import tokens
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("f"))
    )
    top = freq.orderBy(F.col("f").desc(), "term").limit(1000)
    # rank within the 1000-row top-k result (tiny single partition)
    w = Window.orderBy(F.col("f").desc(), "term")
    ranked = top.select("f", F.row_number().over(w).alias("r"))
    lnf = F.log(F.col("f").cast("double"))
    lnr = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.round(F.regr_slope(lnf, lnr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lnf, lnr), 6).alias("zipf_r2"),
    )


@register(
    "text_bpe_roundtrip_stats",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS roundtrip_md5,
           true AS bounds_ok
    FROM documents
    """,
    doc="REAL learned BPE tokenization (Sennrich et al. 2016), end to "
        "end: 200 merges are learned from THIS corpus's word "
        "histogram (one JVM-side boundary-split + groupBy shuffle, "
        "driver sees only the bounded histogram — the industrial "
        "count-words-then-train shape, operators/bpe.py), every doc "
        "is encoded and DECODED back in Arrow-batched mapInPandas, "
        "and the result carries md5 of the decoded bytes plus token-"
        "count sanity bounds (n_tokens <= n_bytes and n_tokens * "
        "max_token_len >= n_bytes). The oracle recomputes md5/strlen "
        "from the source column, so a hash match PROVES the learned "
        "tokenizer round-trips the whole corpus losslessly — the "
        "property a packing/budgeting pipeline stakes its token "
        "accounting on. Exact merge sequences and token counts are "
        "pinned by unit tests (SQL cannot run the merge loop itself)",
)
def text_bpe_roundtrip_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.bpe import bpe_encode_stats, learn_bpe
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    # eager bounded collect at build time (like the KMeans fit in
    # semdedup): the driver sees <=30k histogram rows, never text
    merges = learn_bpe(docs, n_merges=200)
    stats = bpe_encode_stats(docs, merges)
    bounds = (F.col("n_tokens") <= F.col("n_bytes")) & (
        F.col("n_tokens") * F.col("max_token_len") >= F.col("n_bytes")
    )
    return stats.select(
        "doc_id", "n_bytes", "roundtrip_md5", bounds.alias("bounds_ok")
    )


@register(
    "text_collapse_repeats",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    kept AS (
        SELECT doc_id, t,
               [t[i] FOR i IN generate_series(1, len(t))
                IF i = 1 OR t[i] <> t[i-1]] AS k
        FROM toks
    )
    SELECT doc_id,
           array_to_string(k, ' ') AS clean_text,
           CAST(len(t) AS BIGINT) AS n_tokens_before,
           CAST(len(k) AS BIGINT) AS n_tokens_after
    FROM kept
    """,
    doc="intra-doc consecutive-duplicate-token removal (stutter-run "
        "normalization): keep token i iff it differs from token i-1, "
        "rejoin in order — map-only shifted-zip_with, zero shuffle",
)
def text_collapse_repeats(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.collapse_repeated_tokens(docs)


#: fixed retrieval query set for the BM25 surface (terms drawn from the
#: synthetic corpus vocabulary; the SAME literals are baked into the
#: oracle SQL below)
BM25_QUERIES: dict[str, list[str]] = {
    "q_hashjoin": ["hash", "join"],
    "q_windowed_sort": ["window", "sort", "merge"],
    "q_streaming": ["spark", "stream"],
    "q_columnar": ["vector", "scan", "column"],
}

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5


def _bm25_oracle() -> str:
    values = ", ".join(
        f"('{q}', '{t}')" for q, terms in BM25_QUERIES.items() for t in terms
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    q(query_id, term) AS (VALUES {values}),
    docfreq AS (
        SELECT query_id, q.term, count(*) AS df
        FROM tf JOIN q ON tf.term = q.term GROUP BY 1, 2
    ),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1.0 + (stats.n_docs - docfreq.df + 0.5)
                          / (docfreq.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1.0))
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl))
               ), 6) AS score
        FROM tf
        JOIN q ON tf.term = q.term
        JOIN docfreq ON q.query_id = docfreq.query_id
                    AND q.term = docfreq.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id
               ) AS rank
        FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """


@register(
    "text_bm25_topk",
    _bm25_oracle(),
    doc="BM25 sparse retrieval: top-5 docs per query for a fixed "
        "4-query set under Lucene-style Okapi BM25 (k1=1.2, b=0.75, "
        "idf = ln(1+(N-df+0.5)/(df+0.5))) — the lexical-retrieval "
        "companion to the dense ANN queries. One tokenize pass feeds "
        "tf, doc lengths, df AND scoring (tf cached); the literal "
        "query-term table broadcasts and prunes tf before any scoring "
        "work; corpus stats ride a 1-row broadcast; the top-k is a "
        "two-phase (salted local then global) window so no single "
        "per-query partition ever ranks the full match set. Scores "
        "rounded to 6 dp before ranking, ties break on doc_id",
)
def text_bm25_topk(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.bm25_topk(
        docs, BM25_QUERIES, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
    )


_IDX_TERMS = sorted({t for ts in BM25_QUERIES.values() for t in ts})


def _postings_summary(probe):
    """Per-term df / total tf / md5 of the full sorted doc list — the
    one definition both el_inverted_index queries aggregate their
    probes through (and both oracles mirror)."""
    from pyspark.sql import functions as F

    return probe.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).cast("binary")
        ).alias("doc_md5"),
    )


def _inverted_index_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _IDX_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf FROM toks
        WHERE term IN ({terms}) GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS doc_md5
    FROM tf GROUP BY term
    """


@register(
    "el_inverted_index_roundtrip",
    _inverted_index_oracle(),
    doc="retrieval inverted-index EL artifact, round-tripped: postings "
        "(per (term, doc_id%16 shard): sorted doc ids DELTA-encoded + "
        "parallel tfs) are written range-partitioned and sorted BY "
        "TERM — footer stats then prune a term-equality probe to a "
        "handful of row groups, the lakehouse answer to a high-"
        "cardinality partition key (hive partitionBy(term) would mint "
        "one directory per vocabulary entry); sharding bounds a "
        "stopword's posting ROW instead of one giant array cell. The "
        "probe reads the artifact back, prefix-sums the gap arrays "
        "(array-local aggregate, no shuffle), and re-derives df / "
        "total tf / the md5 of each term's full sorted doc list — the "
        "oracle computes the same from the raw documents table, so "
        "the artifact must be value-lossless through delta encode, "
        "shard split and rebuild",
)
def el_inverted_index_roundtrip(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import (
        query_postings,
        write_inverted_index,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    # generation-keyed path (VERDICT r15 #2): stable across bench
    # repeats, distinct per scale factor / regenerated source
    out = generation_tmp_dir(sf_dir, "el_inverted_index")
    write_inverted_index(docs, out)
    probe = query_postings(spark, out, _IDX_TERMS)
    return _postings_summary(probe)


def _inverted_incremental_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _IDX_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term
        FROM documents WHERE doc_id < 600
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf FROM toks
        WHERE term IN ({terms}) GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS doc_md5
    FROM tf GROUP BY term
    """


@register(
    "el_inverted_index_incremental",
    _inverted_incremental_oracle(),
    doc="incremental inverted-index maintenance: the corpus batch "
        "(doc_id<400) is indexed once, then a new-doc increment "
        "(400<=doc_id<600) is indexed WITHOUT re-reading the corpus — "
        "each write is one batch= partition, O(increment) like every "
        "store in the engine — and the probe spans both batches. The "
        "oracle computes the merged answer (df / total tf / sorted "
        "doc-list md5 per term) directly from the raw documents, so "
        "the batched artifact must equal a from-scratch index; "
        "consolidation back to one batch rides the audited crash-safe "
        "swap (equivalence + idempotent-rerun pinned in unit tests)",
)
def el_inverted_index_incremental(spark, sf_dir):
    import os
    import shutil

    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import (
        query_postings,
        write_inverted_index,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    out = generation_tmp_dir(sf_dir, "el_inverted_index_inc")
    # the query must be a pure function of the tables: rebuild the
    # two-batch store from scratch each run (stale batches from an
    # earlier run would leak extra docs into the probe)
    shutil.rmtree(out, ignore_errors=True)
    write_inverted_index(
        docs.filter(F.col("doc_id") < 400), out, batch_token="corpus"
    )
    write_inverted_index(
        docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 600)),
        out,
        batch_token="inc1",
    )
    probe = query_postings(spark, out, _IDX_TERMS)
    return _postings_summary(probe)


@register(
    "el_index_bm25_topk",
    _bm25_oracle(),
    doc="BM25 retrieval SERVED FROM the inverted-index artifact — the "
        "proof the artifact is self-sufficient for ranked retrieval: "
        "the index is built, read back, and its decoded postings "
        "alone supply everything BM25 needs (tf directly; doc "
        "lengths, N and avgdl from one groupBy over the decoded "
        "postings; df from the pruned term set) — the raw text is "
        "never consulted at query time. The oracle is EXACTLY "
        "text_bm25_topk's: index-served ranking must equal "
        "from-the-text ranking score for score, rank for rank",
)
def el_index_bm25_topk(spark, sf_dir):
    import os

    from mongo2pq_spark.operators.text import (
        bm25_from_tf,
        query_postings,
        write_inverted_index,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    # generation-keyed path: the decoded-postings plan is cached
    # (cache_stream in bm25_from_tf keys on plan semantics = the read
    # path), so two scale factors — or two GENERATIONS of one scale
    # factor — sharing a path would serve stale cached postings
    out = generation_tmp_dir(sf_dir, "el_index_bm25")
    write_inverted_index(docs, out)
    tf = query_postings(spark, out, None)  # full decode, distributed
    return bm25_from_tf(
        tf, BM25_QUERIES, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
    ).select("query_id", "doc_id", "score", "rank")


#: fixed phrase-query set (phrases drawn from the synthetic corpus so
#: every query has nonzero matches; 'value value' exercises the
#: repeated-term offset edge); the SAME literals are baked into the
#: oracle SQL below
PHRASE_QUERIES: dict[str, list[str]] = {
    "p_table_hash": ["table", "hash"],
    "p_value_value": ["value", "value"],
    "p_slow_hash_batch": ["slow", "hash", "batch"],
    "p_window_fast_query": ["window", "fast", "query"],
}


def _phrase_oracle() -> str:
    values = ", ".join(
        f"('{q}', '{t}', {i}, {len(terms)})"
        for q, terms in PHRASE_QUERIES.items()
        for i, t in enumerate(terms)
    )
    return f"""
    WITH q(query_id, term, off, n_terms) AS (VALUES {values}),
    toks AS (
        SELECT doc_id,
               unnest({sql_tokens('text')}) AS term,
               generate_subscripts({sql_tokens('text')}, 1) - 1 AS pos
        FROM documents
    ),
    anch AS (
        SELECT q.query_id, t.doc_id, t.pos - q.off AS anchor,
               count(DISTINCT q.off) AS k, min(q.n_terms) AS n_terms
        FROM toks t JOIN q ON t.term = q.term
        GROUP BY 1, 2, 3
    )
    SELECT query_id, doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(anchor) AS BIGINT) AS first_pos
    FROM anch WHERE k = n_terms
    GROUP BY query_id, doc_id
    """


@register(
    "text_phrase_matches",
    _phrase_oracle(),
    doc="exact phrase search for a fixed 4-phrase set via the "
        "positional-index anchor reduction: each occurrence of phrase "
        "term i at token position p votes for anchor p-i, and an "
        "anchor with all |phrase| distinct offsets voting is an exact "
        "in-order match — ONE aggregation instead of the naive "
        "(|phrase|-1)-way positional self-join; repeated phrase terms "
        "('value value') vote once per offset they hold. One "
        "posexplode pass, broadcast literal phrase terms prune before "
        "the shuffle, anchor groupBy keys include doc_id (no skew), "
        "no windows",
)
def text_phrase_matches(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.phrase_matches(docs, PHRASE_QUERIES)


@register(
    "el_index_phrase_matches",
    _phrase_oracle(),
    doc="exact phrase search served FROM the positional inverted-"
        "index artifact (positions=True postings carry each term's "
        "sorted 0-based token positions): the probe prunes the scan "
        "to the 4 phrases' vocabulary via term-equality pushdown, "
        "decodes only those position lists, and runs the same anchor "
        "reduction as text_phrase_matches — oracle is the from-text "
        "phrase oracle VERBATIM, so index-served must equal "
        "text-served on every row (value-lossless positional "
        "round trip)",
)
def el_index_phrase_matches(spark, sf_dir):
    import os

    from mongo2pq_spark.operators.text import (
        phrase_query_index,
        write_inverted_index,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    # generation-keyed path (the el_ queries' policy)
    out = generation_tmp_dir(sf_dir, "el_positional_index")
    write_inverted_index(docs, out, positions=True)
    return phrase_query_index(spark, out, PHRASE_QUERIES)


_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@register(
    "text_pmi_collocations",
    f"""
    WITH toks AS (SELECT {sql_tokens('text')} AS t FROM documents),
    bg AS (
        SELECT unnest({sql_word_shingles('t', 2)}) AS bigram FROM toks
    ),
    cb AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY 1),
    nb AS (SELECT sum(c12) AS n FROM cb),
    lft AS (
        SELECT string_split(bigram, ' ')[1] AS w, sum(c12) AS c1
        FROM cb GROUP BY 1
    ),
    rgt AS (
        SELECT string_split(bigram, ' ')[2] AS w, sum(c12) AS c2
        FROM cb GROUP BY 1
    )
    SELECT bigram, CAST(c12 AS BIGINT) AS n_pair,
           round(ln(CAST(c12 AS DOUBLE) * nb.n
                    / (CAST(lft.c1 AS DOUBLE) * rgt.c2)), 6) AS pmi
    FROM cb
    JOIN lft ON string_split(bigram, ' ')[1] = lft.w
    JOIN rgt ON string_split(bigram, ' ')[2] = rgt.w
    CROSS JOIN nb
    WHERE c12 >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, bigram LIMIT {_PMI_TOPK}
    """,
    doc="PMI collocation mining (Church & Hanks 1990): the top-20 "
        "word pairs by pointwise mutual information ln(c12*N/(c1*c2)) "
        "with POSITIONAL marginals (w1-as-first, w2-as-second counts) "
        "and a min-count floor of 5 against PMI's rare-pair bias — "
        "the association-strength complement to text_top_bigrams' raw "
        "frequency ranking. Shape: marginals derive FROM the bigram "
        "count table (vocab-sized, never a second corpus pass), the "
        "1-row total broadcasts, the global top-20 is Spark's "
        "TakeOrderedAndProject (per-partition heads, no global sort "
        "materialization)",
)
def text_pmi_collocations(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.textfns import tokens, word_shingles
    from mongo2pq_spark.operators.cache import cache_stream
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    cb = cache_stream(
        docs.select(
            F.explode(word_shingles(tokens(F.col("text")), 2)).alias(
                "bigram"
            )
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("c12"))
    )
    parts = F.split(F.col("bigram"), " ")
    nb = cb.agg(F.sum("c12").alias("n"))
    lft = (
        cb.groupBy(parts[0].alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    rgt = (
        cb.groupBy(parts[1].alias("w2"))
        .agg(F.sum("c12").alias("c2"))
    )
    pmi = F.round(
        F.log(
            F.col("c12").cast("double")
            * F.col("n")
            / (F.col("c1").cast("double") * F.col("c2"))
        ),
        6,
    )
    return (
        cb.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(lft, parts[0] == F.col("w1"))
        .join(rgt, parts[1] == F.col("w2"))
        .crossJoin(F.broadcast(nb))
        .select(
            "bigram",
            F.col("c12").cast("bigint").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(_PMI_TOPK)
    )


#: fixed blocklist for the C4-style wordlist filter (benign stand-ins
#: drawn from the synthetic corpus vocabulary — the mechanism is the
#: point; a real deployment supplies its own list). Multi-word entries
#: exercise the phrase form.
BLOCKLIST: list[str] = ["vector", "slow hash", "dormant", "zig zag"]


def _blocklist_oracle() -> str:
    hits = " + ".join(
        f"(CASE WHEN ' ' || text || ' ' LIKE '% {p} %' THEN 1 ELSE 0 END)"
        for p in BLOCKLIST
    )
    return f"""
    SELECT doc_id, CAST({hits} AS BIGINT) AS n_blocked_terms,
           {hits} > 0 AS flagged
    FROM documents
    """


@register(
    "docs_blocklist_filter",
    _blocklist_oracle(),
    doc="C4-style wordlist filtering (Raffel et al. 2020 dropped any "
        "page containing a banned-list word): per doc, how many of a "
        "fixed blocklist's entries occur as WHOLE-TOKEN matches "
        "(space-delimited, multi-word entries supported) and the "
        "resulting drop flag. Map-only: one pass, a constant fold "
        "over the literal pattern array, zero shuffles, zero joins — "
        "the filter stage shape that must never cost more than the "
        "scan itself. Token-boundary semantics (padded-space LIKE) "
        "avoid substring false positives ('vectorize' does not match "
        "'vector')",
)
def docs_blocklist_filter(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    hits = sum(
        F.when(padded.contains(f" {p} "), 1).otherwise(0)
        for p in BLOCKLIST
    )
    return docs.select(
        "doc_id",
        hits.cast("bigint").alias("n_blocked_terms"),
        (hits > 0).alias("flagged"),
    )


@register(
    "text_unigram_tok_roundtrip",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS roundtrip_md5,
           true AS bounds_ok
    FROM documents
    """,
    doc="REAL unigram-LM tokenization (Kudo 2018, the SentencePiece "
        "unigram model), end to end — the second learned-tokenizer "
        "family next to BPE: a substring seed vocabulary is trained "
        "by forward-backward EM over all segmentations of THIS "
        "corpus's word histogram, pruned to the target size "
        "(single-byte pieces are structural and never pruned), and "
        "every doc is Viterbi-encoded and decoded back in Arrow-"
        "batched mapInPandas with SentencePiece-style byte-fallback "
        "(operators/unigram_tok.py). The corpus pass is the SAME one "
        "histogram shuffle BPE uses; the driver sees only bounded "
        "(word, freq) rows. The oracle recomputes md5/strlen from "
        "the source column, so a hash match proves the learned "
        "tokenizer round-trips the whole corpus losslessly; EM "
        "monotonicity, pruning bounds, piece learning, and byte-"
        "fallback totality are pinned by unit tests (SQL cannot run "
        "the EM loop itself)",
)
def text_unigram_tok_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.unigram_tok import (
        learn_unigram,
        unigram_encode_stats,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    # eager bounded collect at build time (the learn_bpe pattern):
    # the driver sees <=30k histogram rows, never text
    logp = learn_unigram(docs, vocab_size=400)
    stats = unigram_encode_stats(docs, logp)
    bounds = (F.col("n_tokens") <= F.col("n_bytes")) & (
        F.col("n_tokens") * F.col("max_token_len") >= F.col("n_bytes")
    )
    return stats.select(
        "doc_id", "n_bytes", "roundtrip_md5", bounds.alias("bounds_ok")
    )


@register(
    "text_html_extract",
    """
    SELECT doc_id,
           md5('Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
               || 'A & B <ok>' || chr(10)
               || trim(regexp_replace(text, '[ \t]+', ' ', 'g')))
               AS text_md5,
           CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
               || 'A & B <ok>' || chr(10)
               || trim(regexp_replace(text, '[ \t]+', ' ', 'g')))
               AS BIGINT) AS n_chars
    FROM documents
    """,
    doc="HTML main-text extraction (the CommonCrawl WET step), end to "
        "end: every doc's text is wrapped in a full HTML page — "
        "title, a <script> whose BODY contains a '<p>' decoy tag, a "
        "comment, entities (&amp;/&lt;/&gt;) in a heading — and the "
        "extractor (operators/text.py::html_extract_text, a pure "
        "JVM regexp chain: script/style WITH contents, comments, "
        "block-closers→newlines, tags→spaces, entity decode with "
        "&amp; last, whitespace normalization) must recover the "
        "GROUND-TRUTH text the builder knows by construction — the "
        "oracle recomputes the expected string and its md5 with no "
        "regex at all, so a hash match proves the whole chain "
        "including the decoy-tag and double-decode traps. Map-only, "
        "zero shuffle, whole-stage codegen",
)
def text_html_extract(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import html_extract_text
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit('</title><script>var x="<p>";</script>'
                  "<style>p{margin:0}</style></head><body>"
                  "<h1>A &amp; B &lt;ok&gt;</h1><p>"),
            F.col("text"),
            F.lit("</p><!-- hidden --></body></html>"),
        ).alias("html"),
    )
    out = html_extract_text(docs)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_md5"), "n_chars"
    )


@register(
    "docs_url_canonicalize",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 7 AS INTEGER)
             WHEN 0 THEN 'https://example' || CAST(doc_id % 5 AS VARCHAR)
                 || '.com/P' || CAST(doc_id AS VARCHAR) || '/?id='
                 || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'http://host' || CAST(doc_id % 5 AS VARCHAR)
                 || '.org'
             WHEN 2 THEN 'http://h' || CAST(doc_id % 5 AS VARCHAR)
                 || '.org/a'
             WHEN 3 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR)
                 || '.io/x?a=1&b=' || CAST(doc_id AS VARCHAR)
             WHEN 4 THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR)
                 || '.io/x?c=3'
             WHEN 5 THEN 'http://plain' || CAST(doc_id % 5 AS VARCHAR)
                 || '.net/path' || CAST(doc_id AS VARCHAR)
             ELSE 'http://nopath' || CAST(doc_id % 5 AS VARCHAR)
                 || '.example?Token=AbC' || CAST(doc_id AS VARCHAR)
           END AS url_canon
    FROM documents
    """,
    doc="URL canonicalization (the crawl-frontier dedup key rule): "
        "per-doc URLs exercising the whole rule matrix — mixed-case "
        "scheme/host with preserved path case, default :443/:80 "
        "ports, fragments, leading/middle/trailing and consecutive "
        "utm_* parameters, trailing slashes, and a NO-PATH authority "
        "whose case-significant query value must survive (ADVICE r11 "
        "fix: the head is now bounded at the first of /?#) — are "
        "canonicalized by "
        "operators/text.py::canonicalize_urls (map-only regexp chain "
        "+ a substring_index split that restores the first query "
        "separator, since regexp_replace is global-only). The oracle "
        "states each case's canonical form CLOSED-FORM, so a match "
        "proves every rule, not just the happy path",
)
def docs_url_canonicalize(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import canonicalize_urls
    from mongo2pq_spark.sources.registry import read_sf_table

    d = F.col("doc_id").cast("string")
    k = (F.col("doc_id") % 5).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("HTTPS://Example"), k, F.lit(".COM:443/P"),
                     d, F.lit("/?utm_source=x&id="), d, F.lit("#f")),
        )
        .when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.lit("http://Host"), k, F.lit(".org:80/")),
        )
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.lit("http://h"), k,
                     F.lit(".org/a?utm_campaign=z")),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit("https://h"), k, F.lit(".io/x?a=1&utm_medium=m&b="), d),
        )
        .when(
            F.col("doc_id") % 7 == 4,
            F.concat(F.lit("https://h"), k,
                     F.lit(".io/x?utm_a=1&utm_b=2&c=3")),
        )
        .when(
            F.col("doc_id") % 7 == 5,
            F.concat(F.lit("http://plain"), k, F.lit(".net/path"), d,
                     F.lit("/")),
        )
        # no-path authority with a default port, a fragment and a
        # case-SIGNIFICANT query value (ADVICE r11: the old head rule
        # lowercased the whole URL when no third '/' existed)
        .otherwise(
            F.concat(F.lit("HTTP://NoPath"), k,
                     F.lit(".example:80?Token=AbC"), d, F.lit("#frag")),
        )
    )
    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url")
    )
    return canonicalize_urls(docs)


@register(
    "web_outlinks",
    """
    WITH d AS (
        SELECT doc_id, doc_id % 4 AS nl, doc_id % 7 = 0 AS ni
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS link_idx,
           'http://site' || CAST((doc_id + j.i) % 5 AS VARCHAR)
               || '.example/p/' || CAST(doc_id * 3 + j.i AS VARCHAR)
               AS href,
           ni AS noindex
    FROM d, generate_series(0, 2) j(i)
    WHERE j.i < nl
    """,
    doc="crawl-graph edge extraction: per-doc HTML pages are built "
        "with a closed-form anchor rule (0-3 outlinks per page, "
        "attribute noise around href, a page-level robots-noindex "
        "meta on every 7th page) and the outlinks + noindex flag are "
        "recovered by operators/text.py::html_extract_links — the "
        "edge source PageRank/host-reputation consume and the gate "
        "a polite pipeline honors before indexing. Pages with zero "
        "anchors emit no rows (sparse edge table by design). The "
        "oracle states every (doc, link_idx, href) closed-form — no "
        "regex in the oracle. Map-only posexplode, zero shuffle",
)
def web_outlinks(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import html_extract_links
    from mongo2pq_spark.sources.registry import read_sf_table

    d = F.col("doc_id")
    nl = d % 4
    anchor = lambda j: F.concat(  # noqa: E731
        F.lit('<p>x</p><a class="out" href="http://site'),
        ((d + j) % 5).cast("string"),
        F.lit(".example/p/"),
        (d * 3 + j).cast("string"),
        F.lit('">link</a>'),
    )
    anchors = F.when(
        nl > 0,
        F.array_join(
            F.transform(F.sequence(F.lit(0), nl - 1), anchor), ""
        ),
    ).otherwise(F.lit(""))
    meta = F.when(
        d % 7 == 0,
        F.lit('<meta name="robots" content="noindex, nofollow">'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), meta,
        F.lit("</head><body>"), anchors, F.lit("</body></html>"),
    )
    docs = read_sf_table(spark, sf_dir, "documents").filter(
        d < 200
    ).select("doc_id", html.alias("html"))
    return html_extract_links(docs)


@register(
    "web_robots_audit",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN doc_id % 2 = 1   -- /private/ disallowed for *
             WHEN 1 THEN doc_id % 2 = 0   -- only /public/ allowed
             ELSE true                    -- rules target another agent
           END AS allowed,
           CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END AS crawl_delay
    FROM documents WHERE doc_id < 200
    """,
    doc="crawl-politeness audit: per-doc robots.txt bodies exercising "
        "the rule matrix — wildcard-agent Disallow with Crawl-delay, "
        "agent-specific Allow-before-Disallow carve-outs, and groups "
        "targeting a DIFFERENT agent (which must not bind us) — are "
        "evaluated against closed-form URLs by the stdlib "
        "urllib.robotparser (operators/text.py::robots_allowed; "
        "first-match REP semantics, per-batch parser memo since hosts "
        "repeat heavily in a crawl). A pipeline ingesting crawled "
        "HTML is expected to PROVE it honored robots; this is that "
        "proof's batch-audit form, next to the noindex gate "
        "(web_outlinks). Oracle states every verdict closed-form. "
        "Map-only",
)
def web_robots_audit(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import robots_allowed
    from mongo2pq_spark.sources.registry import read_sf_table

    d = F.col("doc_id")
    robots = (
        F.when(
            d % 3 == 0,
            F.lit("User-agent: *\nDisallow: /private/\nCrawl-delay: 2"),
        )
        .when(
            d % 3 == 1,
            F.lit("User-agent: trainbot\nAllow: /public/\nDisallow: /"),
        )
        .otherwise(F.lit("User-agent: otherbot\nDisallow: /"))
    )
    url = F.concat(
        F.lit("http://h"),
        (d % 5).cast("string"),
        F.lit(".io"),
        F.when((d % 3 == 0) & (d % 2 == 0), F.lit("/private/p"))
        .when((d % 3 == 1) & (d % 2 == 0), F.lit("/public/p"))
        .otherwise(F.lit("/open/p")),
        d.cast("string"),
    )
    docs = read_sf_table(spark, sf_dir, "documents").filter(
        d < 200
    ).select("doc_id", robots.alias("robots_txt"), url.alias("url"))
    out = robots_allowed(docs)
    return out.select(
        "doc_id",
        "allowed",
        F.coalesce(F.col("crawl_delay"), F.lit(0)).alias("crawl_delay"),
    )


@register(
    "web_sitemap_urls",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 5 AS nu
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS url_idx,
           'http://site' || CAST(doc_id % 5 AS VARCHAR)
               || '.example/p/' || CAST(doc_id * 7 + j.i AS VARCHAR)
               AS loc,
           CASE WHEN j.i % 2 = 0
                THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR) || '-15'
                ELSE '' END AS lastmod,
           CASE WHEN j.i % 3 = 0
                THEN CAST((1 + j.i) AS DOUBLE) / 10
                ELSE CAST(-1 AS DOUBLE) END AS priority
    FROM d, generate_series(0, 4) j(i)
    WHERE j.i < nu
    """,
    doc="sitemap ingestion (the crawl-frontier seed source next to "
        "the outlink extractor): per-doc namespaced sitemap.org "
        "<urlset> documents — optional <lastmod>/<priority> per URL — "
        "are built and exploded back by the stdlib-ElementTree parser "
        "(operators/text.py::parse_sitemap; namespace-aware, missing "
        "<loc> fails loud, <sitemapindex> is the typed fetch-layer "
        "boundary). The oracle states every (doc, idx, loc, lastmod, "
        "priority) closed-form — no XML in the oracle. Map-only "
        "explode",
)
def web_sitemap_urls(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import sitemap_urls
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        for pdf in batches:
            xmls = []
            for d in pdf["doc_id"]:
                d = int(d)
                urls = []
                for i in range(1 + d % 5):
                    parts = [
                        f"<loc>http://site{d % 5}.example/p/{d * 7 + i}"
                        "</loc>"
                    ]
                    if i % 2 == 0:
                        parts.append(
                            f"<lastmod>2024-0{1 + d % 9}-15</lastmod>"
                        )
                    if i % 3 == 0:
                        parts.append(
                            f"<priority>{(1 + i) / 10}</priority>"
                        )
                    urls.append("<url>" + "".join(parts) + "</url>")
                xmls.append(
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<urlset xmlns='
                    '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                    + "".join(urls)
                    + "</urlset>"
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "xml": xmls})

    files = docs.mapInPandas(build_batches, "doc_id bigint, xml string")
    out = sitemap_urls(files)
    # absent optional fields surface as SQL-stable sentinels: the
    # driver canonicalizer renders a NULL double differently per
    # engine path (None vs NaN), so '' / -1.0 keep the compare exact
    return out.select(
        "doc_id",
        "url_idx",
        "loc",
        F.coalesce(F.col("lastmod"), F.lit("")).alias("lastmod"),
        F.coalesce(F.col("priority"), F.lit(-1.0)).alias("priority"),
    )


@register(
    "web_warc_gzip_bodies",
    """
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS rec_idx,
           list_extract(
               ['identity', 'gzip', 'chunked', 'gzip+chunked',
                'deflate-raw'], CAST(j.i AS INTEGER) + 1) AS encoding,
           CAST(200 AS INTEGER) AS http_status,
           md5(text) AS body_md5,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM d, generate_series(0, 4) j(i)
    """,
    doc="the HTTP bodies real CommonCrawl responses actually ship "
        "(VERDICT r16 #1 — the web-ingestion chain's last wire gap): "
        "per-doc WARC files carry the SAME document five ways — "
        "identity, Content-Encoding: gzip, Transfer-Encoding: chunked "
        "(with a chunk extension in the framing), gzip NESTED inside "
        "chunked (proving the wire-order dechunk→inflate), and raw-"
        "stream 'deflate' (the in-the-wild RFC-1950 ambiguity) — and "
        "the pure-stdlib WARC walk + HTTP split (operators/warc.py) "
        "must recover byte-identical plaintext from every variant: "
        "the oracle recomputes md5/octet-length of the document text "
        "closed-form, so a hash match across all five rec_idx values "
        "proves dechunk and inflate are exact inverses of the "
        "fixture's encoders. Map-only explode; corpus-scale "
        "parallelism is CommonCrawl's file sharding",
)
def web_warc_gzip_bodies(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import warc as warc_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 150)

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.warc import build_warc_stub

        variants = [
            {},
            {"content_encoding": "gzip"},
            {"chunked": True},
            {"content_encoding": "gzip", "chunked": True},
            {"content_encoding": "deflate-raw"},
        ]
        for pdf in batches:
            payloads = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                body = str(text).encode()
                uri = f"http://site{d % 5}.example/p/{d}"
                payloads.append(
                    build_warc_stub(
                        [
                            dict(
                                {
                                    "warc_type": "response",
                                    "uri": uri,
                                    "date": "2024-01-01T00:00:00Z",
                                    "status": 200,
                                    "content_type": "text/html",
                                    "body": body,
                                },
                                **v,
                            )
                            for v in variants
                        ]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    recs = warc_ops.warc_records(files)
    labels = F.array(
        *[
            F.lit(s)
            for s in (
                "identity",
                "gzip",
                "chunked",
                "gzip+chunked",
                "deflate-raw",
            )
        ]
    )
    return recs.select(
        "doc_id",
        "rec_idx",
        F.element_at(labels, F.col("rec_idx") + 1).alias("encoding"),
        "http_status",
        F.md5("body").alias("body_md5"),
        F.octet_length("body").cast("bigint").alias("n_bytes"),
    )


@register(
    "web_warc_gz_members",
    """
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           CAST(3 AS INTEGER) AS n_members,
           CAST(j.i AS INTEGER) AS rec_idx,
           list_extract(['warcinfo', 'request', 'response'],
                        CAST(j.i AS INTEGER) + 1) AS warc_type,
           md5(list_extract(
               ['software: fixture',
                'GET / HTTP/1.1' || chr(13) || chr(10)
                                 || chr(13) || chr(10),
                text],
               CAST(j.i AS INTEGER) + 1)) AS body_md5
    FROM d, generate_series(0, 2) j(i)
    """,
    doc="the .warc.gz layout CommonCrawl ACTUALLY distributes (r17): "
        "one gzip member PER RECORD, concatenated — the framing that "
        "lets the cdx index seek to a member offset and inflate one "
        "record from a 1 GB archive. Per-doc fixtures gzip each of "
        "three records (warcinfo / request / response) as its own "
        "member; the response body is additionally gzip "
        "Content-Encoded AND chunked on the inner HTTP layer, so the "
        "row proves the full nesting: member gunzip → record walk → "
        "dechunk → inflate. n_members == record count pins the "
        "per-record-member layout; every body md5 is stated "
        "closed-form by the oracle. Map-only explode",
)
def web_warc_gz_members(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import warc as warc_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 150)

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.warc import build_warc_gz

        for pdf in batches:
            payloads = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                uri = f"http://site{d % 5}.example/p/{d}"
                payloads.append(
                    build_warc_gz(
                        [
                            {"warc_type": "warcinfo", "uri": "none",
                             "date": "2024-01-01T00:00:00Z",
                             "body": b"software: fixture"},
                            {"warc_type": "request", "uri": uri,
                             "date": "2024-01-01T00:00:00Z",
                             "body": b"GET / HTTP/1.1\r\n\r\n"},
                            {"warc_type": "response", "uri": uri,
                             "date": "2024-01-01T00:00:00Z",
                             "status": 200,
                             "content_type": "text/html",
                             "body": str(text).encode(),
                             "content_encoding": "gzip",
                             "chunked": True},
                        ]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return warc_ops.warc_gz_records(files).select(
        "doc_id",
        "n_members",
        "rec_idx",
        "warc_type",
        F.md5("body").alias("body_md5"),
    )


@register(
    "web_sitemap_index",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 6 AS nc
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS sitemap_idx,
           'http://site' || CAST(doc_id % 5 AS VARCHAR)
               || '.example/sitemap-' || CAST(j.i AS VARCHAR)
               || '.xml.gz' AS loc,
           CASE WHEN j.i % 2 = 0
                THEN '2024-0' || CAST(1 + (doc_id + j.i) % 9 AS VARCHAR)
                     || '-01'
                ELSE '' END AS lastmod
    FROM d, generate_series(0, 5) j(i)
    WHERE j.i < nc
    """,
    doc="sitemap INDEX parsing (r17 — the 'sitemap of sitemaps' "
        "large sites actually serve at /sitemap.xml; the previous "
        "typed refusal retired for the parse half): per-doc "
        "namespaced <sitemapindex> documents with 1-6 <sitemap> "
        "children (optional <lastmod>) are built and exploded to the "
        "frontier table a crawl scheduler joins against fetch state "
        "(operators/text.py::parse_sitemap_index; fetching the "
        "children stays the fetch layer's job — each child then "
        "parses via the existing web_sitemap_urls machinery). The "
        "oracle states every (doc, idx, loc, lastmod) closed-form. "
        "Map-only explode",
)
def web_sitemap_index(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import sitemap_index_entries
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        for pdf in batches:
            xmls = []
            for d in pdf["doc_id"]:
                d = int(d)
                kids = []
                for i in range(1 + d % 6):
                    parts = [
                        f"<loc>http://site{d % 5}.example/"
                        f"sitemap-{i}.xml.gz</loc>"
                    ]
                    if i % 2 == 0:
                        parts.append(
                            f"<lastmod>2024-0{1 + (d + i) % 9}-01"
                            "</lastmod>"
                        )
                    kids.append(
                        "<sitemap>" + "".join(parts) + "</sitemap>"
                    )
                xmls.append(
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<sitemapindex xmlns='
                    '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                    + "".join(kids)
                    + "</sitemapindex>"
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "xml": xmls})

    files = docs.mapInPandas(build_batches, "doc_id bigint, xml string")
    out = sitemap_index_entries(files)
    return out.select(
        "doc_id",
        "sitemap_idx",
        "loc",
        F.coalesce(F.col("lastmod"), F.lit("")).alias("lastmod"),
    )


@register(
    "text_srt_cues",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 5 AS nc
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(1 + j.i AS INTEGER) AS cue_idx,
           CAST(j.i * 2000 + doc_id % 997 AS BIGINT) AS start_ms,
           CAST(j.i * 2000 + doc_id % 997 + 900 + (doc_id + j.i) % 400
                AS BIGINT) AS end_ms,
           'Cue ' || CAST(doc_id AS VARCHAR) || '-'
               || CAST(j.i AS VARCHAR)
               || CASE WHEN j.i % 2 = 1
                       THEN chr(10) || 'second line' ELSE '' END
               AS text
    FROM d, generate_series(0, 4) j(i)
    WHERE j.i < nc
    """,
    doc="timed-text (SubRip) ingestion: per-doc .srt files with "
        "closed-form cue timings (sub-second millisecond components "
        "exercised via doc_id % 997) and alternating single/multi-line "
        "cue text are built and exploded back by the stdlib parser "
        "(operators/text.py::parse_srt) — the ingestion step for the "
        "subtitle/ASR-alignment corpora that feed speech-text "
        "training, upstream of the text-quality/dedup machinery. "
        "HH:MM:SS,mmm arithmetic is proven by the closed-form "
        "millisecond oracle; malformed timings/indices and end≤start "
        "cues fail loud. Map-only explode",
)
def text_srt_cues(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import srt_cues
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        def fmt(ms):
            s, mms = divmod(ms, 1000)
            m, s = divmod(s, 60)
            h, m = divmod(m, 60)
            return f"{h:02d}:{m:02d}:{s:02d},{mms:03d}"

        for pdf in batches:
            srts = []
            for d in pdf["doc_id"]:
                d = int(d)
                blocks = []
                for i in range(1 + d % 5):
                    start = i * 2000 + d % 997
                    end = start + 900 + (d + i) % 400
                    text = f"Cue {d}-{i}"
                    if i % 2 == 1:
                        text += "\nsecond line"
                    blocks.append(
                        f"{i + 1}\n{fmt(start)} --> {fmt(end)}\n{text}"
                    )
                srts.append("\n\n".join(blocks) + "\n")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "srt": srts})

    files = docs.mapInPandas(build_batches, "doc_id bigint, srt string")
    return srt_cues(files)


@register(
    "text_fix_mojibake",
    """
    SELECT doc_id,
           doc_id % 3 = 0 AS was_mojibake,
           CASE WHEN doc_id % 3 = 1
                THEN 'plain ascii doc ' || CAST(doc_id AS VARCHAR)
                ELSE 'café’s naïve résumé — doc '
                     || CAST(doc_id AS VARCHAR)
           END AS text
    FROM documents
    """,
    doc="encoding repair (the ftfy mojibake rule as pure JVM "
        "translate+encode+decode, zero shuffle): per doc, every 3rd "
        "document's accented text is DELIBERATELY mangled into "
        "faithful cp1252 mojibake ('café’s' -> 'cafÃ©â€™s', built by "
        "the inverse fold, exercising both the cp1252 glyph fold and "
        "the latin-1 byte path), the rest stay clean ascii/accented; "
        "operators/text.py::fix_mojibake must repair exactly the "
        "mangled third and pass the others through byte-identical — "
        "the self-gating validity rule (structural UTF-8 regex over "
        "latin-1 chars-as-bytes) proven against a GROUND-TRUTH "
        "closed-form oracle that never runs the repair",
)
def text_fix_mojibake(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.text import cp1252_unfold, fix_mojibake
    from mongo2pq_spark.sources.registry import read_sf_table

    d = F.col("doc_id").cast("string")
    clean = F.concat(F.lit("café’s naïve résumé — doc "), d)
    # faithful cp1252 mojibake: UTF-8 bytes misread as cp1252 =
    # latin-1 byte decode + C1-control -> glyph unfold
    moji = cp1252_unfold(
        F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    )
    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, moji)
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("plain ascii doc "), d),
        )
        .otherwise(clean)
        .alias("text"),
    )
    return fix_mojibake(docs)
