"""Time-series queries over the events stream: hypertable-style
bucket rollup with gap fill, a bucketized interval range join, and a
fixed-width value histogram. All value-exact against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2pq_spark.operators.timeseries import (
    bucketed_range_join_count,
    rollup_gapfill,
)
from mongo2pq_spark.queries.registry import register


def _events(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, "events")


@register(
    "events_rollup_gapfill",
    """
    WITH r AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               count(*) AS n_events,
               round(avg(value), 6) AS avg_value,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM r),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM b
    ),
    grps AS (SELECT DISTINCT event_type FROM events)
    SELECT g.event_type, s.bucket,
           CAST(coalesce(r.n_events, 0) AS BIGINT) AS n_events,
           r.avg_value, r.sum_value
    FROM spine s CROSS JOIN grps g
    LEFT JOIN r ON r.bucket = s.bucket AND r.event_type = g.event_type
    """,
    doc="hypertable-style hourly rollup with gap fill: every (type, "
        "hour) cell in the data's bucket range appears exactly once, "
        "empty hours as n_events=0 — ONE map-side-combinable aggregation "
        "over the events; the spine (hours × types) is grid-sized and "
        "broadcast, the raw table is never re-read",
)
def events_rollup_gapfill(spark, sf_dir):
    return rollup_gapfill(_events(spark, sf_dir), unit="hour")


@register(
    "range_join_click_attribution",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks_5min
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 300 SECOND
     AND c.ts < p.ts
    GROUP BY 1, 2, 3
    """,
    doc="interval range join (attribution: clicks by the same user in "
        "the 5 minutes before each purchase), executed as a BUCKETIZED "
        "equi-join: probes explode into the ≤2 width-w time cells their "
        "window overlaps, build rows match by (user, cell), a residual "
        "filter applies exact bounds — the naive BETWEEN theta-join "
        "would be a broadcast nested loop, quadratic at scale",
)
def range_join_click_attribution(spark, sf_dir):
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return bucketed_range_join_count(
        purchases,
        clicks,
        key_col="user_id",
        probe_id_col="event_id",
        probe_ts="ts",
        build_ts="ts",
        window_seconds=300,
        count_alias="n_clicks_5min",
    )


@register(
    "events_value_histogram",
    """
    WITH h AS (
        SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
               count(*) AS n_events
        FROM events GROUP BY 1
    ),
    t AS (SELECT count(*) AS total FROM events)
    SELECT bin,
           round(bin * 25.0, 6) AS lo,
           round((bin + 1) * 25.0, 6) AS hi,
           CAST(n_events AS BIGINT) AS n_events,
           round(n_events * 1.0 / total, 6) AS share
    FROM h CROSS JOIN t
    """,
    doc="fixed-width histogram over the value column (width-25 bins "
        "with explicit edges and corpus share) — one "
        "map-side-combinable aggregation plus a broadcast of the "
        "1-row total; the distributed form of `df.value_counts`",
)
def events_value_histogram(spark, sf_dir):
    ev = _events(spark, sf_dir)
    hist = ev.groupBy(
        F.floor(F.col("value") / 25).cast("bigint").alias("bin")
    ).agg(F.count("*").alias("n_events"))
    total = ev.agg(F.count("*").alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "bin",
        F.round(F.col("bin") * 25.0, 6).alias("lo"),
        F.round((F.col("bin") + 1) * 25.0, 6).alias("hi"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
    )


@register(
    "events_rolling_1h_user",
    """
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS sum_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="rolling 1-hour per-user window (RANGE frame over event time): "
        "for every event, how many events and how much value the same "
        "user produced in the preceding hour incl. the current row — "
        "the per-entity trailing-window feature every fraud/abuse "
        "pipeline computes. Frame ordered on exact epoch MICROS (the "
        "fixture carries sub-second timestamps; second-truncation would "
        "change frame membership between engines); decimal sum keeps "
        "the windowed aggregate order-independent. Partitioning is on "
        "user_id — a key whose cardinality GROWS with the data (150 at "
        "sf0.01, millions at 100 TB), so per-task sort size stays "
        "bounded, unlike a ~5-value event_type window",
)
def events_rolling_1h_user(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_value_1h"),
    )


_DECAY_HALF_LIFE_MS = 86_400_000.0  # one day


@register(
    "events_decay_scores",
    f"""
    WITH ref AS (SELECT max(epoch_ms(ts)) AS ref_ms FROM events),
    scored AS (
        SELECT user_id,
               value * pow(
                   0.5,
                   (ref.ref_ms - epoch_ms(ts)) / {_DECAY_HALF_LIFE_MS}
               ) AS w
        FROM events CROSS JOIN ref
        WHERE user_id IS NOT NULL AND value IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(w), 6) + 0.0 AS decayed_value
    FROM scored GROUP BY user_id
    """,
    doc="exponential time-decay scoring (half-life 1 day): per user "
        "the freshness-weighted value sum 'sum(value * 2^(-age/half-life))' "
        "— the recency weighting a training-mix or engagement ranker "
        "applies to event streams. The reference instant is the "
        "corpus max timestamp on a 1-row broadcast (never wall-clock, "
        "so runs are reproducible); ages computed in integer epoch "
        "millis (portable across engines), one map pass + one "
        "user-keyed partial agg; -0.0 canonicalized via +0.0",
)
def events_decay_scores(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    ev = read_sf_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    ref = ev.agg(F.max(F.unix_millis("ts")).alias("ref_ms"))
    return (
        ev.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            (
                F.col("value")
                * F.pow(
                    F.lit(0.5),
                    (F.col("ref_ms") - F.unix_millis("ts"))
                    / F.lit(_DECAY_HALF_LIFE_MS),
                )
            ).alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("w"), 6) + F.lit(0.0)).alias("decayed_value"),
        )
    )


_PSI_BINS = 10
_PSI_EPS = 1e-6


@register(
    "events_psi_drift",
    f"""
    WITH e AS (
        SELECT event_type, value, epoch_ms(ts) AS ms FROM events
    ),
    mid AS (
        SELECT CAST(floor((min(ms) + max(ms)) / 2.0) AS BIGINT) AS mid
        FROM e
    ),
    refstats AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi,
               count(*) AS n_ref
        FROM e, mid WHERE ms < mid GROUP BY event_type
    ),
    curstats AS (
        SELECT event_type, count(*) AS n_cur
        FROM e, mid WHERE ms >= mid GROUP BY event_type
    ),
    binned AS (
        SELECT e.event_type,
               least(greatest(CAST(floor({_PSI_BINS} * (e.value - r.lo)
                   / greatest(r.hi - r.lo, 1e-12)) AS BIGINT),
                   0), {_PSI_BINS - 1}) AS bin,
               CASE WHEN e.ms < mid.mid THEN 1 ELSE 0 END AS is_ref
        FROM e
        JOIN refstats r ON e.event_type = r.event_type
        CROSS JOIN mid
    ),
    cnt AS (
        SELECT event_type, bin,
               sum(is_ref) AS c_ref, sum(1 - is_ref) AS c_cur
        FROM binned GROUP BY 1, 2
    ),
    terms AS (
        SELECT cnt.event_type,
               (CAST(c_cur AS DOUBLE) / n_cur + {_PSI_EPS}
                - CAST(c_ref AS DOUBLE) / n_ref - {_PSI_EPS})
               * ln((CAST(c_cur AS DOUBLE) / n_cur + {_PSI_EPS})
                    / (CAST(c_ref AS DOUBLE) / n_ref + {_PSI_EPS}))
                   AS term,
               n_ref, n_cur
        FROM cnt
        JOIN refstats USING (event_type)
        JOIN curstats USING (event_type)
    )
    SELECT event_type,
           round(sum(term), 6) + 0.0 AS psi,
           CAST(min(n_ref) AS BIGINT) AS n_ref,
           CAST(min(n_cur) AS BIGINT) AS n_cur,
           round(sum(term), 6) > 0.2 AS drifted
    FROM terms GROUP BY event_type
    """,
    doc="population stability index per event_type between the first "
        "and second time halves (the standard tabular feature-drift "
        "gate; PSI > 0.2 = actionable shift) — the numeric complement "
        "to the embedding drift monitor. Bins are {_bins} fixed-width "
        "intervals over the REFERENCE half's per-type value range; "
        "epsilon-smoothed shares keep empty bins finite. Shape: the "
        "time midpoint and per-type reference stats ride 1-row / "
        "types-bounded broadcasts, bin assignment is map-only, and "
        "the PSI reduction is two partial-agg groupBys over "
        "(type, bin) keys — bounded at types x 10 rows, no windows, "
        "no sort".replace("{_bins}", str(_PSI_BINS)),
)
def events_psi_drift(spark, sf_dir):
    e = _events(spark, sf_dir).select(
        "event_type", "value", F.unix_millis("ts").alias("ms")
    )
    mid = e.agg(
        F.floor((F.min("ms") + F.max("ms")) / 2.0)
        .cast("bigint")
        .alias("mid")
    )
    e = e.crossJoin(F.broadcast(mid))
    ref = e.filter(F.col("ms") < F.col("mid"))
    refstats = ref.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n_ref"),
    )
    curstats = (
        e.filter(F.col("ms") >= F.col("mid"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_cur"))
    )
    bin_col = F.least(
        F.greatest(
            F.floor(
                _PSI_BINS
                * (F.col("value") - F.col("lo"))
                / F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12))
            ).cast("bigint"),
            F.lit(0),
        ),
        F.lit(_PSI_BINS - 1),
    )
    cnt = (
        e.join(F.broadcast(refstats), "event_type")
        .select(
            "event_type",
            bin_col.alias("bin"),
            F.when(F.col("ms") < F.col("mid"), 1).otherwise(0).alias(
                "is_ref"
            ),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum("is_ref").alias("c_ref"),
            F.sum(1 - F.col("is_ref")).alias("c_cur"),
        )
    )
    p = F.col("c_ref").cast("double") / F.col("n_ref") + _PSI_EPS
    q = F.col("c_cur").cast("double") / F.col("n_cur") + _PSI_EPS
    terms = (
        cnt.join(F.broadcast(refstats.select("event_type", "n_ref")),
                 "event_type")
        .join(F.broadcast(curstats), "event_type")
        .select(
            "event_type",
            ((q - p) * F.log(q / p)).alias("term"),
            "n_ref",
            "n_cur",
        )
    )
    return terms.groupBy("event_type").agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("psi"),
        F.min("n_ref").cast("bigint").alias("n_ref"),
        F.min("n_cur").cast("bigint").alias("n_cur"),
        (F.round(F.sum("term"), 6) > 0.2).alias("drifted"),
    )


_KS_BIN_WIDTH = 5.0  # events.value spans ~[0, 500] -> ~100 bounded bins


@register(
    "events_ks_drift",
    f"""
    WITH e AS (
        SELECT CAST(floor(value / {_KS_BIN_WIDTH}) AS BIGINT) AS bin,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    b AS (SELECT bin, sum(a) AS ca, sum(1 - a) AS cb FROM e GROUP BY 1),
    c AS (
        SELECT bin,
               sum(ca) OVER (ORDER BY bin) AS cuma,
               sum(cb) OVER (ORDER BY bin) AS cumb
        FROM b
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nbins FROM b)
    SELECT CAST(na AS BIGINT) AS n_click,
           CAST(nb AS BIGINT) AS n_purchase,
           CAST(nbins AS BIGINT) AS n_bins,
           bin AS ks_at_bin,
           round(abs(cuma * nb - cumb * na) * 1.0
                 / greatest(na * nb, 1), 6) + 0.0 AS ks_d
    FROM c CROSS JOIN t
    ORDER BY abs(cuma * nb - cumb * na) DESC, bin
    LIMIT 1
    """,
    doc="two-sample Kolmogorov-Smirnov drift statistic between the "
        "click and purchase value distributions — the rank-based "
        "complement to PSI (PSI weights by density ratio, KS reports "
        "the worst-case CDF gap). Computed on the binned empirical "
        "CDFs (fixed-width bins, the corpus_perplexity_buckets "
        "pattern): the supremum over bin boundaries is a LOWER bound "
        "on the unbinned D that converges as the bin width shrinks, "
        "and it is ENGINE-EXACT — the max is over integer "
        "cross-products cum_a*n_b - cum_b*n_a, so the argmax bin and "
        "the final ratio are bit-stable (no float CDF comparisons). "
        "Shape: one map-side-combinable (bin) aggregate, a cumulative "
        "window over the BOUNDED bin table (~100 rows by "
        "construction — never the raw events), a 1-row totals "
        "broadcast, and a TakeOrdered(1) for the argmax: the events "
        "table is read once and never globally sorted",
)
def events_ks_drift(spark, sf_dir):
    from pyspark.sql import Window

    e = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") / _KS_BIN_WIDTH)
            .cast("bigint")
            .alias("bin"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("a"),
        )
    )
    b = e.groupBy("bin").agg(
        F.sum("a").alias("ca"), F.sum(1 - F.col("a")).alias("cb")
    )
    # unpartitioned window is safe here: it runs over the BIN table,
    # bounded at value_range/width rows by construction
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = b.select(
        "bin",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    t = b.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count("*").alias("nbins"),
    )
    j = c.crossJoin(F.broadcast(t)).withColumn(
        "diff_num",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
    )
    return (
        j.orderBy(F.desc("diff_num"), "bin")
        .limit(1)
        .select(
            F.col("na").cast("bigint").alias("n_click"),
            F.col("nb").cast("bigint").alias("n_purchase"),
            F.col("nbins").cast("bigint").alias("n_bins"),
            F.col("bin").alias("ks_at_bin"),
            (
                F.round(
                    F.col("diff_num")
                    * 1.0
                    / F.greatest(F.col("na") * F.col("nb"), F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("ks_d"),
        )
    )


#: Benford's-law first-digit probabilities log10(1 + 1/d); the SAME
#: repr-exact literals are baked into the Spark expression and the
#: oracle SQL so both engines hold bit-identical doubles.
_BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829992, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}


@register(
    "events_benford_deviation",
    f"""
    WITH cents AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
            AS digit
        FROM cents
    ),
    cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    tot AS (SELECT sum(n) AS total FROM cnt)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / total, 6) + 0.0 AS obs_share,
           CASE digit
               {" ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items())}
           END AS benford_share,
           round(abs(CAST(n AS DOUBLE) / total - CASE digit
               {" ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items())}
           END), 6) + 0.0 AS abs_dev
    FROM cnt CROSS JOIN tot
    """,
    doc="Benford's-law first-significant-digit audit of the value "
        "column — the classic numeric-QA screen for fabricated or "
        "truncated measurements (organic multi-scale data follows "
        "log10(1+1/d); uniform synthetic data, like this fixture's, "
        "deviates hard on digits 1-4 — the deviation IS the signal). "
        "The digit is extracted INTEGER-exactly: value→cents by one "
        "correctly-rounded double multiply, then the first character "
        "of the integer's decimal rendering — no log10/floor float "
        "boundary, so digit buckets are engine-bit-stable. Shape: "
        "map-only projection, one 9-key aggregate, a 1-row total "
        "broadcast",
)
def events_benford_deviation(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("value") > 0)
    digit = F.substring(
        F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    cnt = e.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("total"))
    bshare = F.create_map(
        *[F.lit(x) for dp in _BENFORD_P.items() for x in dp]
    )[F.col("digit")]
    return cnt.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        (
            F.round(F.col("n").cast("double") / F.col("total"), 6)
            + F.lit(0.0)
        ).alias("obs_share"),
        bshare.alias("benford_share"),
        (
            F.round(
                F.abs(
                    F.col("n").cast("double") / F.col("total") - bshare
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("abs_dev"),
    )
