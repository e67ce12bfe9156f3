from energydatalake_spark.plans.registry import QUERIES, entry_query, oracle_sql_map

__all__ = ["QUERIES", "entry_query", "oracle_sql_map"]
