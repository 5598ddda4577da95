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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import token_hash32
from mongo2pq_spark.functions.textfns import tokens

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


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Split each document into fixed-token-count chunks with overlap
    (stride < chunk_size ⇒ consecutive chunks share chunk_size−stride
    tokens) — the standard long-document → context-window preparation.
    Tokens are whitespace words; chunk text is scalarized to an md5
    digest (driver canonicalizer contract: no top-level arrays).

    Plan: tokenize ONCE per row into a materialized array column, then
    posexplode a `sequence` of chunk-start offsets and `slice` the
    array per chunk. The token array is projected BEFORE the generator,
    so slicing after explode reads the materialized array — NOT a
    re-tokenize per chunk (the Catalyst lambda-inlining trap: computing
    the array inside a per-chunk lambda would re-run the tokenizer
    O(chunks) times per row). One narrow pass, zero shuffles, output
    rows ≈ corpus_tokens / stride.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, "__toks", F.size("__toks").alias("__n")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = base.filter(F.col("__n") > 0).select(
        F.col(id_col),
        F.col("__toks"),
        F.col("__n"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("__start").cast("bigint").alias("start_tok"),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("__start"))
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size), " "
            ).cast("binary")
        ).alias("chunk_md5"),
    )


#: training-mix weights per language: >1 upsamples (epochs-style doc
#: repetition), <1 downsamples. Fractional parts are realized by a
#: deterministic md5-hash threshold, so the mix is reproducible across
#: engines, runs, and cluster sizes.
DEFAULT_MIX_WEIGHTS = {"en": 2.5, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 0.25}
MIX_DENOM = 10_000


def weighted_mix_upsample(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training mix: each document appears
    ``floor(w) + (hash < frac(w))`` times, where ``w`` is its
    stratum's weight — the deterministic-expectation form of
    "epochs per source" corpus mixing (w=2.5 ⇒ every doc twice, half
    the docs a third time; w=0.25 ⇒ a quarter of the docs once).

    A map-only pass: per-row CASE for the weight, md5-hash threshold
    for the fractional copy, `explode(sequence(...))` for the
    repetition — no shuffle, no RNG state, linear output in the mix
    size. Emits (row per copy) with ``copy_idx`` so downstream shard
    assignment can spread copies across shards.
    """
    w = weights or DEFAULT_MIX_WEIGHTS
    base_copies: Column = F.lit(0)
    frac_bp: Column = F.lit(0)
    for k, wt in w.items():
        base_copies = F.when(F.col(key_col) == k, int(wt)).otherwise(base_copies)
        frac_bp = F.when(
            F.col(key_col) == k, int(round((wt - int(wt)) * MIX_DENOM))
        ).otherwise(frac_bp)
    h = token_hash32(F.col(id_col).cast("string")) % MIX_DENOM
    n_copies = (base_copies + (h < frac_bp).cast("int")).alias("n_copies")
    counted = df.withColumn("n_copies", n_copies).filter(F.col("n_copies") > 0)
    return counted.select(
        F.col(id_col),
        F.col(key_col),
        F.col("n_copies").cast("bigint").alias("n_copies"),
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("bigint"))


def temperature_mix_epochs(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "lang",
    id_col: str = "doc_id",
    budget_mult: float = 1.0,
) -> DataFrame:
    """Temperature-scaled corpus mixing with DATA-DERIVED weights — the
    multilingual-LM sampling recipe (p_i ∝ c_i^α): small domains are
    upsampled toward parity, large ones damped, α=1 keeps natural
    proportions and α=0 gives uniform. Per-domain epochs follow from
    holding the total budget at ``budget_mult · N`` docs:
    ``epochs_i = N·mult·c_i^(α−1) / Σ_j c_j^α``.

    Where ``weighted_mix_upsample`` materializes a FIXED weight table,
    this derives the table from the corpus itself, then materializes
    copies by the same deterministic rule — ``floor(e) + (md5-hash <
    frac(e))`` — with the fractional part quantized to integer basis
    points via ``floor(x·10⁴ + 0.5)`` (explicit half-up in BOTH
    engines; engine round() builtins disagree on ties). ``epochs_bp``
    (epochs in basis points, an exact integer) rides along for
    observability.

    Shape at scale: one tiny per-domain count aggregate (domain
    cardinality is bounded — languages/sources — never data-scaling),
    a 1-row Σc^α broadcast onto it, then the epochs table broadcast
    into a map-side join with the corpus; copy materialization is the
    same map-only explode as the fixed-weight path. No shuffle touches
    the full corpus."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("c"))
    z = counts.agg(
        F.sum(F.pow(F.col("c").cast("double"), F.lit(alpha))).alias("z"),
        F.sum("c").alias("n_total"),
    )
    epochs_tbl = counts.crossJoin(F.broadcast(z)).select(
        key_col,
        (
            F.col("n_total").cast("double")
            * F.lit(budget_mult)
            * F.pow(F.col("c").cast("double"), F.lit(alpha - 1.0))
            / F.col("z")
        ).alias("epochs"),
    )
    with_e = df.select(id_col, key_col).join(
        F.broadcast(epochs_tbl), key_col
    )
    n_base = F.floor(F.col("epochs")).cast("bigint")
    frac_bp = F.floor(
        (F.col("epochs") - F.floor(F.col("epochs"))) * MIX_DENOM + 0.5
    ).cast("bigint")
    h = token_hash32(F.col(id_col).cast("string")) % MIX_DENOM
    counted = (
        with_e.withColumn(
            "n_copies", (n_base + (h < frac_bp).cast("bigint"))
        )
        .withColumn(
            "epochs_bp", (n_base * MIX_DENOM + frac_bp).cast("bigint")
        )
        .filter(F.col("n_copies") > 0)
    )
    return counted.select(
        F.col(id_col),
        F.col(key_col),
        F.col("epochs_bp"),
        F.col("n_copies").cast("bigint").alias("n_copies"),
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("bigint"))


# -- packed fixed-length token sequences (payload level) ---------------------

PACKED_SEQ_TOKENS = 256


def pack_token_payloads(
    payloads: DataFrame,
    seq_tokens: int = PACKED_SEQ_TOKENS,
    n_shards: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """True pretraining packing at the BYTE level: each hash shard's
    documents are laid end to end in doc-id order into one token
    stream, and the stream is cut every ``seq_tokens`` tokens — a
    document straddling a boundary CONTINUES into the next sequence
    (the packed-sequence-with-attention-masking regime the module
    docstring describes, now materialized as trainer-ready payloads,
    not just bin accounting).

    Input: ``(name, payload)`` rows of ``doc<id>.tokens`` uint32-LE
    token ids (``operators/bpe.py::bpe_encode_payloads``). Returns
    ``(sequences, spans)``:

    * sequences — ``(name, payload)`` rows ``s<shard>_q<k>.tokens``,
      each exactly ``seq_tokens`` tokens except a shard's last;
    * spans — ``(doc_id, shard, start, n_tokens)`` provenance: where
      each document's tokens live in its shard stream. Ship it as the
      sidecar; reassembly (``unpack_token_payloads``) needs it.

    Scale shape, all built-in JVM expressions: the shard is the
    md5-hash of the doc id (deterministic, engine-portable), offsets
    are ONE running-sum window per shard (corpus/n_shards rows each —
    parallelism is chosen, not inherited), fragments are bounded
    byte-range ``substring`` slices (a doc yields at most
    n_tokens/seq_tokens + 1 fragments), and sequence assembly is ONE
    shuffle on the (shard, seq) key with an order-insensitive
    array_sort concat. No Python in the loop; offsets are a pure
    function of (doc order, token counts), so the output is identical
    under any partitioning."""
    # fail loud on foreign member names (ADVICE r14): regexp_extract
    # returns '' on no-match, which would cast to a NULL doc_id and
    # flow silently into the spans/window ordering — inconsistent
    # with bpe_decode_payloads' fail-loud contract for the same
    # interchange. assert_true rides inside the doc_id expression so
    # the optimizer cannot prune it.
    name_ok = F.assert_true(
        F.col("name").rlike(r"^doc\d+\.tokens$"),
        F.concat(
            F.lit("unexpected member name in token payloads: "),
            F.col("name"),
        ),
    )
    parsed = payloads.select(
        F.when(
            name_ok.isNull(),
            F.regexp_extract("name", r"^doc(\d+)\.tokens$", 1).cast(
                "bigint"
            ),
        ).alias("doc_id"),
        "payload",
        (F.octet_length("payload") / 4).cast("bigint").alias("n_tokens"),
    )
    shard = (
        token_hash32(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
        % n_shards
    ).alias("shard")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # persisted (r18): the placed stream — upstream of which sits the
    # full (often Arrow-encoded) payload pipeline plus this window —
    # feeds BOTH return values, and callers drive them with SEPARATE
    # actions (ship the sequences, write the spans sidecar); uncached,
    # the second action re-runs the entire encode+window.
    from mongo2pq_spark.operators.cache import cache_stream

    placed = cache_stream(
        parsed.select("doc_id", "payload", "n_tokens", shard).withColumn(
            "start", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
    )
    spans = placed.select("doc_id", "shard", "start", "n_tokens")

    frag = placed.filter(F.col("n_tokens") > 0).select(
        "shard",
        "payload",
        "start",
        "n_tokens",
        F.explode(
            F.sequence(
                (F.col("start") / seq_tokens).cast("bigint"),
                ((F.col("start") + F.col("n_tokens") - 1) / seq_tokens).cast(
                    "bigint"
                ),
            )
        ).alias("q"),
    )
    a = F.greatest(F.col("start"), F.col("q") * seq_tokens)
    b = F.least(
        F.col("start") + F.col("n_tokens"), (F.col("q") + 1) * seq_tokens
    )
    sliced = frag.select(
        "shard",
        "q",
        a.alias("a"),
        F.expr(
            f"substring(payload, cast((greatest(start, q * {seq_tokens}) "
            f"- start) * 4 + 1 as int), cast((least(start + n_tokens, "
            f"(q + 1) * {seq_tokens}) - greatest(start, q * {seq_tokens})) "
            f"* 4 as int))"
        ).alias("frag"),
    )
    sequences = (
        sliced.groupBy("shard", "q")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("a", "frag"))),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["frag"]),
            ).alias("payload")
        )
        .select(
            F.concat(
                F.lit("s"),
                F.col("shard").cast("string"),
                F.lit("_q"),
                F.col("q").cast("string"),
                F.lit(".tokens"),
            ).alias("name"),
            "payload",
        )
    )
    return sequences, spans


def unpack_token_payloads(
    members: DataFrame,
    spans: DataFrame,
    seq_tokens: int = PACKED_SEQ_TOKENS,
) -> DataFrame:
    """Invert ``pack_token_payloads``: given the sequence members read
    back from shards and the spans sidecar, rebuild every document's
    ``doc<id>.tokens`` payload byte-exactly (empty documents
    included). Each span enumerates the sequences it overlaps (the
    same bounded F.sequence), equi-joins them on (shard, seq) — never
    a payload-side cross join — slices its byte range out of each,
    and concatenates in absolute-position order."""
    seqs = members.select(
        F.regexp_extract("name", r"^s(\d+)_q(\d+)\.tokens$", 1)
        .cast("bigint")
        .alias("shard"),
        F.regexp_extract("name", r"^s(\d+)_q(\d+)\.tokens$", 2)
        .cast("bigint")
        .alias("q"),
        F.col("payload").alias("seq_payload"),
    )
    overlaps = spans.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "shard",
        "start",
        "n_tokens",
        F.explode(
            F.sequence(
                (F.col("start") / seq_tokens).cast("bigint"),
                ((F.col("start") + F.col("n_tokens") - 1) / seq_tokens).cast(
                    "bigint"
                ),
            )
        ).alias("q"),
    )
    joined = overlaps.join(seqs, ["shard", "q"])
    rebuilt = (
        joined.select(
            "doc_id",
            F.greatest(F.col("start"), F.col("q") * seq_tokens).alias("a"),
            F.expr(
                f"substring(seq_payload, cast((greatest(start, q * "
                f"{seq_tokens}) - q * {seq_tokens}) * 4 + 1 as int), "
                f"cast((least(start + n_tokens, (q + 1) * {seq_tokens}) - "
                f"greatest(start, q * {seq_tokens})) * 4 as int))"
            ).alias("frag"),
        )
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("a", "frag"))),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["frag"]),
            ).alias("payload")
        )
    )
    empties = spans.filter(F.col("n_tokens") == 0).select(
        "doc_id", F.lit(b"").alias("payload")
    )
    return rebuilt.unionByName(empties).select(
        F.concat(
            F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".tokens")
        ).alias("name"),
        "payload",
    )
