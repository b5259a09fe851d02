"""Thirty-first extension batch: table profiling (ANALYZE-style column
statistics).

q_profile_table is the data-profiling pass every lakehouse runs on
ingest: per column — row count, null count, exact distinct count, and
lexical/numeric min/max rendered as strings. It is the source of the
stats a CBO consumes (Spark's own ANALYZE TABLE ... COMPUTE STATISTICS
FOR COLUMNS computes exactly this family) and the first debugging query
against any unfamiliar table.

Plan shape: ONE single-column aggregate branch per profiled column,
unioned. A combined aggregate with k exact count_distincts looked
cheaper on paper but planned as Expand x(k+1) -> Sort -> SortAggregate
keyed on ALL k columns at once (wide string keys, 7x the input rows
through a sort) — measured 3.3 s at sf0.1. One branch per column keeps
Spark's single-distinct rewrite (two-stage hash aggregate keyed on just
that column, no Expand, no sort), each branch's parquet scan prunes to
exactly one column, and the union's branches run as independent stages
of one job. At 100 TB each branch shuffles only that column's distinct
values — strictly fewer bytes than the expanded 7-way sort key.
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
    branches = []
    for c, is_double in _PROFILE_COLS:
        if is_double:
            mn = F.format_string("%.4f", F.min(c))
            mx = F.format_string("%.4f", F.max(c))
        else:
            mn = F.min(c).cast("string")
            mx = F.max(c).cast("string")
        branches.append(
            ev.select(c)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                mn.alias("min_s"),
                mx.alias("max_s"),
            )
            .select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
