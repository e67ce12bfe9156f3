"""The reference's four analytics as *Spark SQL text* (SURVEY.md §3,
entry point 3): in the reference these ran as BigQuery SQL strings
outside the engine (``Queries/*.sql``, README.md:216-300); here the
same SQL parses through Catalyst over registered views, making the SQL
and DataFrame forms two frontends of one plan. ``tests/test_sql_forms.py``
asserts each SQL form is row-identical to its DataFrame twin in
``registry.py``.

Dialect note: these are Spark-SQL strings (run via ``spark.sql``), not
the DuckDB oracle strings in the registry — same queries, third engine
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from energydatalake_spark.io.readers import register_views

# Queries/Average Energy Consumption by Month.sql:3-11, re-targeted
SPARK_SQL_AVG_BY_MONTH = """
SELECT CAST(month(l_shipdate) AS INT) AS month,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY month(l_shipdate)
ORDER BY month
"""

# Queries/How does energy consumption vary by time of day_.sql:1-9
SPARK_SQL_AVG_BY_HOUR = """
SELECT CAST(hour(ts) AS INT) AS hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       COUNT(*) AS n_events
FROM events
GROUP BY hour(ts)
ORDER BY hour
"""

# Queries/Percentage Distribution of Each Energy.sql:5-15 shape
SPARK_SQL_MIX_PERCENTAGE = """
SELECT
  FLOOR(CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(25,8)) ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) * 100 * 1e2 + 0.5) / 1e2 AS pct_a,
  FLOOR(CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(25,8)) ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) * 100 * 1e2 + 0.5) / 1e2 AS pct_n,
  FLOOR(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(25,8)) ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) * 100 * 1e2 + 0.5) / 1e2 AS pct_r
FROM lineitem
"""

# README.md:288-300 (weather-vs-price correlate)
SPARK_SQL_MULTIKEY_AVG = """
SELECT l_returnflag, l_linestatus,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*) * 1e2 + 0.5) / 1e2
         AS average_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY average_price DESC
"""

# Engine extension (not a reference query): hierarchical subtotals as
# SQL text — pins that GROUP BY ROLLUP parses through the same Catalyst
# path as the DataFrame `.rollup()` twin (registry `rollup_revenue`).
SPARK_SQL_ROLLUP_REVENUE = """
SELECT COALESCE(l_returnflag, '<ALL>') AS returnflag,
       COALESCE(l_linestatus, '<ALL>') AS linestatus,
       COUNT(*) AS n_rows,
       FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE)
             * 1e2 + 0.5) / 1e2 AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

SQL_FORMS: dict[str, str] = {
    "avg_by_month": SPARK_SQL_AVG_BY_MONTH,
    "avg_by_hour": SPARK_SQL_AVG_BY_HOUR,
    "mix_percentage": SPARK_SQL_MIX_PERCENTAGE,
    "multikey_avg": SPARK_SQL_MULTIKEY_AVG,
}

#: Forms whose DataFrame twin declares no output order — parity is
#: row-set equality (the SQL adds ORDER BY only for determinism).
SQL_FORMS_UNORDERED: dict[str, str] = {
    "rollup_revenue": SPARK_SQL_ROLLUP_REVENUE,
}


def run_sql_form(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql({**SQL_FORMS, **SQL_FORMS_UNORDERED}[name])
