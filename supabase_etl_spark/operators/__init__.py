from supabase_etl_spark.operators.joins import asof_join, range_join

__all__ = ["asof_join", "range_join"]
