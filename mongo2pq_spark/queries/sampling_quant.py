"""Sampling and quantization queries: deterministic stratified
sampling, quantile bucketing, and int8 embedding quantization (the 4×
storage-reduction path for 100 TB embedding tables).

Both sampling queries are registered on their SCALE-SAFE plans: a
``row_number() OVER (PARTITION BY event_type ...)`` formulation windows
over a ~5-value key, so at 100× every stratum is one task sorting
billions of rows — straggler/OOM by construction. The hash-threshold
sample is a pure map-side filter (zero shuffles) and the quartile
bucketing derives bin edges from a sketch aggregate; the ordered-window
exact forms survive only as test oracles (tests/test_queries_oracle.py
cross-checks) — the same registered-vs-oracle split used for embedding
near-dup (LSH registered, all-pairs as oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import sql_token_hash32, token_hash32
from mongo2pq_spark.queries.registry import register


def _t(spark, sf_dir, name):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


#: per-stratum sampling rates in basis points of _RATE_DENOM (so the
#: threshold compare is integer-exact in both engines); unknown strata
#: fall back to _DEFAULT_BP
_STRATA_BP = {"click": 2000, "view": 1000, "purchase": 5000, "signup": 500,
              "error": 100}
_DEFAULT_BP = 1000
_RATE_DENOM = 10_000


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN {bp}" for t, bp in _STRATA_BP.items()
    )
    return f"CASE event_type {whens} ELSE {_DEFAULT_BP} END"


@register(
    "stratified_sample",
    f"""
    SELECT event_id, event_type FROM events
    WHERE {sql_token_hash32('CAST(event_id AS VARCHAR)')} % {_RATE_DENOM}
          < {_strata_case_sql()}
    """,
    doc="deterministic per-stratum sampling via an md5 hash threshold on "
        "the row id — the scale-safe form of df.sampleBy: a pure map-side "
        "filter (ZERO shuffles, no window, no RNG state), reproducible "
        "across engines/runs/cluster sizes, with an independent rate per "
        "event_type (20% click / 10% view / 50% purchase / 5% signup / "
        "1% error)",
)
def stratified_sample(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    threshold = F.lit(_DEFAULT_BP)
    for t, bp in _STRATA_BP.items():
        threshold = F.when(F.col("event_type") == t, F.lit(bp)).otherwise(
            threshold
        )
    keep = (
        token_hash32(F.col("event_id").cast("string")) % _RATE_DENOM
    ) < threshold
    return e.filter(keep).select("event_id", "event_type")


@register(
    "value_quartile_buckets",
    """
    WITH edges AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS e1,
               quantile_cont(value, 0.50) AS e2,
               quantile_cont(value, 0.75) AS e3
        FROM events GROUP BY event_type
    ),
    bucketed AS (
        SELECT ev.event_type,
               1 + CAST(value > e1 AS INT) + CAST(value > e2 AS INT)
                 + CAST(value > e3 AS INT) AS quartile
        FROM events ev JOIN edges USING (event_type)
    ),
    counts AS (
        SELECT event_type, quartile, count(*) AS n
        FROM bucketed GROUP BY 1, 2
    ),
    totals AS (SELECT event_type, sum(n) AS total FROM counts GROUP BY 1)
    SELECT c.event_type, CAST(c.quartile AS BIGINT) AS quartile,
           abs(n * 1.0 / total - 0.25) <= 0.05 AS share_ok
    FROM counts c JOIN totals USING (event_type)
    """,
    doc="quantile bucketing per group on the scale path: bin edges from "
        "percentile_approx (one sketch aggregate — mergeable map-side, no "
        "per-group sort), broadcast back, bucket = edge comparisons. Each "
        "engine derives its OWN edges and asserts the resulting buckets "
        "are balanced (share within 0.25±0.05) — a tolerance oracle, like "
        "the approx-distinct/percentile queries; the exact NTILE window "
        "form survives as a test-only cross-check",
)
def value_quartile_buckets(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    edges = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("edges")
    )
    bucketed = e.join(F.broadcast(edges), "event_type").select(
        "event_type",
        (
            F.lit(1)
            + (F.col("value") > F.col("edges")[0]).cast("int")
            + (F.col("value") > F.col("edges")[1]).cast("int")
            + (F.col("value") > F.col("edges")[2]).cast("int")
        ).alias("quartile"),
    )
    counts = bucketed.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("total"))
    return counts.join(totals, "event_type").select(
        "event_type",
        F.col("quartile").cast("bigint").alias("quartile"),
        (F.abs(F.col("n") / F.col("total") - 0.25) <= 0.05).alias("share_ok"),
    )


@register(
    "embedding_quantize_int8",
    """
    WITH scaled AS (
        SELECT vec_id,
               list_max([abs(x) FOR x IN CAST(embedding AS DOUBLE[])]) AS max_abs,
               CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               round(max_abs, 6) AS scale,
               [CAST(round(x * 127.0 / max_abs, 0) AS BIGINT) FOR x IN emb] AS qv
        FROM scaled WHERE max_abs > 0
    )
    SELECT vec_id, scale,
           CAST(len(qv) AS BIGINT) AS n_dims,
           md5(array_to_string(qv, ',')) AS q_md5
    FROM q
    """,
    doc="int8 symmetric quantization of embeddings (per-vector max-abs "
        "scale): 4x storage cut for 100 TB vector tables; dequantize is "
        "q * scale / 127. Output is scalarized (n_dims + md5 digest of "
        "the int array) — registered queries never return top-level "
        "array/struct columns, so any downstream canonicalizer can "
        "sort/hash the result (see tests/test_config.py registry guard)",
)
def embedding_quantize_int8(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(as_double, lambda x: F.abs(x)))
    scaled = emb.select(
        "vec_id", as_double.alias("emb"), max_abs.alias("max_abs")
    ).filter(F.col("max_abs") > 0)
    q = F.transform(
        F.col("emb"),
        lambda x: F.round(x * 127.0 / F.col("max_abs"), 0).cast("bigint"),
    )
    return scaled.select(
        "vec_id",
        F.round(F.col("max_abs"), 6).alias("scale"),
        F.size(q).cast("bigint").alias("n_dims"),
        F.md5(F.concat_ws(",", q.cast("array<string>")).cast("binary")).alias(
            "q_md5"
        ),
    )


@register(
    "weighted_sample_quality",
    """
    WITH w AS (
        SELECT doc_id, lang, n_chars,
               least(1.0, n_chars / 400.0) AS weight
        FROM documents
    )
    SELECT doc_id, lang, n_chars, round(weight, 6) AS weight
    FROM w
    WHERE CAST(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 1000000 < CAST(floor(weight * 1000000) AS BIGINT)
    """,
    doc="deterministic WEIGHTED sampling — the training-mix primitive: "
        "each document is kept with probability proportional to a "
        "quality weight (here length-derived, capped at 1), decided by "
        "a portable MD5 hash of its id against the weight threshold. "
        "Map-only (no shuffle, no RNG state): the same corpus always "
        "yields the same sample on any cluster size, so mixes are "
        "reproducible and resumable — rerunning after adding documents "
        "re-decides only the new ids. Integer-space threshold compare "
        "(hash % 1e6 < floor(weight·1e6)) keeps both engines exact",
)
def weighted_sample_quality(spark, sf_dir):
    from mongo2pq_spark.functions.hashing import hash64

    docs = _t(spark, sf_dir, "documents")
    weight = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    accept = hash64(
        F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))
    ) % 1000000 < F.floor(weight * 1000000).cast("bigint")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(weight, 6).alias("weight"),
        )
        .filter(accept)
    )


_QUOTA_K = 10


@register(
    "sample_quota_per_source",
    f"""
    WITH ranked AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id
               ) AS rank
        FROM documents
    )
    SELECT source, doc_id, n_chars, rank
    FROM ranked WHERE rank <= {_QUOTA_K}
    """,
    doc="per-domain quota sampling: cap each source's contribution at "
        "its top-10 docs by length (deterministic doc_id tiebreak) — "
        "the domain-budget curation step that stops one crawl source "
        "from dominating a mix. The source key is LOW-cardinality, so "
        "a naive per-source window serializes every source's full doc "
        "set through one task; this runs the reusable TWO-PHASE "
        "salted top-k (operators/joins.py::salted_topk, shared with "
        "BM25): a (source, doc_id%32) local prune bounds the final "
        "per-source partition at 32·k rows regardless of fan-in",
)
def sample_quota_per_source(spark, sf_dir):
    from mongo2pq_spark.operators.joins import salted_topk
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return salted_topk(
        docs.select(
            "source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
        ),
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        _QUOTA_K,
        salt_src=F.col("doc_id"),
    ).select("source", "doc_id", "n_chars", "rank")


_ES_K = 100


@register(
    "sample_weighted_priority",
    f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               round(
                   ln(({sql_token_hash32("'es:' || CAST(doc_id AS VARCHAR)")}
                       + 1.0) / 4294967296.0)
                   / greatest(n_chars, 1), 9) AS priority
        FROM documents
    )
    SELECT doc_id, n_chars, priority, rank FROM (
        SELECT doc_id, n_chars, priority,
               row_number() OVER (
                   ORDER BY priority DESC, doc_id
               ) AS rank
        FROM keyed
    ) WHERE rank <= {_ES_K}
    """,
    doc="weighted sampling WITHOUT replacement (Efraimidis-Spiliotis "
        "A-Res): each doc draws u in (0,1] from its md5 hash and the "
        "top-k by ln(u)/w are the exact weighted sample — one pass, "
        "no RNG state, reproducible across runs and cluster sizes; "
        "weights here are doc lengths, the long-doc-favoring "
        "subsample a token-budgeted corpus cut wants (the existing "
        "weighted_sample_quality is Bernoulli WITH replacement "
        "semantics — this completes the pair). Priorities rounded to "
        "9 dp before ranking, doc_id tiebreak; the global top-k runs "
        "through the reusable two-phase salted window so no single "
        "partition ranks the corpus",
)
def sample_weighted_priority(spark, sf_dir):
    from mongo2pq_spark.functions.hashing import token_hash32
    from mongo2pq_spark.operators.joins import salted_topk
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    u = (
        token_hash32(F.concat(F.lit("es:"), F.col("doc_id").cast("string")))
        + 1.0
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round(
            F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 9
        ).alias("priority"),
    )
    return salted_topk(
        keyed,
        [],
        [F.col("priority").desc(), F.col("doc_id")],
        _ES_K,
        salt_src=F.col("doc_id"),
    ).select("doc_id", "n_chars", "priority", "rank")


#: Poisson(1) CDF cut points (repr-exact doubles shared by both
#: engines): a hash-uniform u maps to replicate count k = #cuts < u.
_POIS_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253,
)
_BOOT_REPS = 32


def _sql_boot_u(rep: str) -> str:
    return (
        "CAST(('0x' || substr(md5('boot:' || CAST(event_id AS VARCHAR)"
        f" || ':' || CAST({rep} AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )


@register(
    "events_bootstrap_ci",
    f"""
    WITH reps AS (
        SELECT e.event_id, e.value, r.i AS rep,
               {" + ".join(f"(CASE WHEN {_sql_boot_u('r.i')} > {c} THEN 1 ELSE 0 END)" for c in _POIS_CDF)}
                   AS w
        FROM events e, generate_series(0, {_BOOT_REPS - 1}) r(i)
        WHERE e.event_type = 'purchase'
    ),
    means AS (
        SELECT rep,
               round(sum(w * value) / greatest(sum(w), 1), 6) AS m,
               CAST(sum(w) AS BIGINT) AS n_eff
        FROM reps GROUP BY rep
    ),
    ranked AS (
        SELECT m, row_number() OVER (ORDER BY m, rep) AS rk FROM means
    )
    SELECT CAST({_BOOT_REPS} AS BIGINT) AS n_replicates,
           (SELECT CAST(min(n_eff) AS BIGINT) FROM means) AS min_n_eff,
           (SELECT m FROM ranked WHERE rk = 2) + 0.0 AS ci_lo,
           (SELECT m FROM ranked WHERE rk = {_BOOT_REPS - 1}) + 0.0
               AS ci_hi,
           (SELECT round(avg(m), 6) FROM means) + 0.0 AS boot_mean
    """,
    doc="Poisson bootstrap confidence interval for mean(purchase "
        "value) — THE distributed bootstrap: classical resampling "
        "needs n draws WITH replacement per replicate (a shuffle per "
        "replicate), while Poisson(1) replicate weights are drawn "
        "per-row INDEPENDENTLY, so all 32 replicates are one map-only "
        "expand + one bounded aggregate, the shape that survives "
        "100 TB. Weights are DETERMINISTIC: u = md5(row, replicate) "
        "as a 32-bit uniform, k = inverse Poisson CDF via repr-exact "
        "cut points shared by both engines — the whole query is "
        "value-oracle-able, no RNG state. CI = the 2nd/31st order "
        "statistics of the replicate means (~93.75% coverage at "
        "B=32), ties broken by replicate id",
)
def events_bootstrap_ci(spark, sf_dir):
    from pyspark.sql import Window

    from mongo2pq_spark.functions.hashing import token_hash32
    from mongo2pq_spark.sources.registry import read_sf_table

    e = (
        read_sf_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
    )
    reps = e.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("rep"),
    )
    u = token_hash32(
        F.concat(
            F.lit("boot:"),
            F.col("event_id").cast("string"),
            F.lit(":"),
            F.col("rep").cast("string"),
        )
    ) / F.lit(4294967296.0)
    w = sum(
        F.when(u > F.lit(c), 1).otherwise(0) for c in _POIS_CDF
    )
    means = (
        reps.withColumn("w", w)
        .groupBy("rep")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("value"))
                / F.greatest(F.sum("w"), F.lit(1)),
                6,
            ).alias("m"),
            F.sum("w").cast("bigint").alias("n_eff"),
        )
    )
    wnd = Window.orderBy("m", "rep")  # bounded: B rows
    ranked = means.select("m", "n_eff", F.row_number().over(wnd).alias("rk"))
    return ranked.agg(
        F.lit(_BOOT_REPS).cast("bigint").alias("n_replicates"),
        F.min("n_eff").cast("bigint").alias("min_n_eff"),
        (F.max(F.when(F.col("rk") == 2, F.col("m"))) + F.lit(0.0)).alias(
            "ci_lo"
        ),
        (
            F.max(F.when(F.col("rk") == _BOOT_REPS - 1, F.col("m")))
            + F.lit(0.0)
        ).alias("ci_hi"),
        (F.round(F.avg("m"), 6) + F.lit(0.0)).alias("boot_mean"),
    )
