"""Data-quality contract runner: declarative column rules evaluated in
ONE pass over the table, reported long-format — the
assert-before-publish stage (Great-Expectations-style) a pipeline runs
on every dataset it ships, complementing the column-stats profile
(`queries/relational.py::profile_events_stats`, which describes;
rules JUDGE against a contract).

Rule kinds:

- ``not_null``            — col must be non-null
- ``unique``              — col values must be distinct (violations =
                            n_rows − NDV, the number of EXTRA copies)
- ``min`` / ``max``       — non-null values must be ≥ / ≤ ``value``
                            (null-ness is ``not_null``'s job, so nulls
                            never double-count here)
- ``in_set``              — non-null values must be in ``values``
- ``regex``               — non-null values must fully match
                            ``pattern`` (anchored semantics supplied
                            by the pattern itself)
- ``fk``                  — non-null values must exist in
                            ``dim_df[dim_col]`` (referential
                            integrity; the dim's distinct key is
                            broadcast — dimension tables are the
                            bounded side by definition)

Scale shape: every non-fk rule compiles to a conditional-sum
expression inside ONE aggregate over the table (``unique`` adds a
count-distinct expand to the same pass); each fk rule is one broadcast
left join chained BEFORE that aggregate — the fact table is scanned
once no matter how many rules the contract holds. The wide 1-row
result is unpivoted driver-side into (rule_id, …) rows: bounded at
len(rules), never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "min", "max", "in_set", "regex", "fk")


def validate_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` (dicts with ``rule_id``, ``kind``, ``col``
    and the kind's parameter — ``value``, ``values``, ``pattern``, or
    ``dim_df``/``dim_col``) against ``df`` in one scan. Returns one
    row per rule: ``(rule_id, kind, column, n_rows, n_violations,
    violation_frac, passed)``, ordered by rule_id."""
    seen = set()
    for r in rules:
        if r["kind"] not in _KINDS:
            raise ValueError(f"unknown rule kind {r['kind']!r}")
        if r["rule_id"] in seen:
            raise ValueError(f"duplicate rule_id {r['rule_id']!r}")
        seen.add(r["rule_id"])

    work = df
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, r in enumerate(rules):
        c = F.col(r["col"])
        kind = r["kind"]
        if kind == "not_null":
            bad = c.isNull()
        elif kind == "unique":
            aggs.append(
                (F.count(F.lit(1)) - F.countDistinct(c)).alias(f"__v{i}")
            )
            continue
        elif kind == "min":
            bad = c.isNotNull() & (c < F.lit(r["value"]))
        elif kind == "max":
            bad = c.isNotNull() & (c > F.lit(r["value"]))
        elif kind == "in_set":
            bad = c.isNotNull() & ~c.isin(*r["values"])
        elif kind == "regex":
            bad = c.isNotNull() & ~c.rlike(r["pattern"])
        else:  # fk
            marker = f"__fk{i}"
            dim = (
                r["dim_df"]
                .select(F.col(r["dim_col"]).alias(r["col"]))
                .distinct()
                .withColumn(marker, F.lit(1))
            )
            work = work.join(F.broadcast(dim), r["col"], "left")
            bad = c.isNotNull() & F.col(marker).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"__v{i}"))

    wide = work.agg(*aggs)
    structs = []
    for i, r in enumerate(rules):
        v = F.col(f"__v{i}")
        structs.append(
            F.struct(
                F.lit(r["rule_id"]).alias("rule_id"),
                F.lit(r["kind"]).alias("kind"),
                F.lit(r["col"]).alias("column"),
                F.col("__n_rows").cast("bigint").alias("n_rows"),
                v.cast("bigint").alias("n_violations"),
                (
                    F.round(
                        v.cast("double")
                        / F.greatest(F.col("__n_rows"), F.lit(1)),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("violation_frac"),
                (v == 0).alias("passed"),
            )
        )
    return (
        wide.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("rule_id")
    )
