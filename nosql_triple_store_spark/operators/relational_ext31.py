"""Thirty-first extension batch: table profiling (ANALYZE-style column
statistics).

q_profile_table is the data-profiling pass every lakehouse runs on
ingest: per column — row count, null count, exact distinct count, and
lexical/numeric min/max rendered as strings. It is the source of the
stats a CBO consumes (Spark's own ANALYZE TABLE ... COMPUTE STATISTICS
FOR COLUMNS computes exactly this family) and the first debugging query
against any unfamiliar table.

Plan shape: ONE pass over the table computing all per-column aggregates
simultaneously (a single partial-aggregable hash aggregate with ~4·k
expressions — not k passes), then a stack() unpivot of the 1-row result
into (column, stat) rows. The unpivot is on one row, so the whole query
shuffles 1 row; distinct counts use exact count_distinct which Spark
evaluates via expand within the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.triple import E_CTE
from ..registry import register

# (column, is_double) — doubles render via printf to pin the decimal
# form across engines; everything else casts to string identically.
_PROFILE_COLS = [
    ("event_id", False),
    ("ts", False),
    ("user_id", False),
    ("event_type", False),
    ("value", True),
    ("props", False),
]


def _duck_minmax(col: str, is_double: bool) -> tuple[str, str]:
    if is_double:
        return (
            f"printf('%.4f', min({col}))",
            f"printf('%.4f', max({col}))",
        )
    return f"CAST(min({col}) AS VARCHAR)", f"CAST(max({col}) AS VARCHAR)"


_PROFILE_ORACLE = f"""
{E_CTE}
""" + "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_duck_minmax(c, d)[0]} AS min_s,
       {_duck_minmax(c, d)[1]} AS max_s
FROM e
"""
    for c, d in _PROFILE_COLS
)


@register("q_profile_table", oracle=_PROFILE_ORACLE)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the events table (rows, nulls, exact
    distinct, min/max as strings) in ONE aggregation pass + a 1-row
    unpivot — the ANALYZE TABLE statistics family as a query."""
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for c, is_double in _PROFILE_COLS:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if is_double:
            aggs.append(
                F.format_string("%.4f", F.min(c)).alias(f"{c}__min")
            )
            aggs.append(
                F.format_string("%.4f", F.max(c)).alias(f"{c}__max")
            )
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)"
    )
