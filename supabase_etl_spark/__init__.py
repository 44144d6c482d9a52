"""supabase_etl_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference `daominhchien/supabase-etl` (a 163-line pandas ETL script,
surveyed in /root/repo/SURVEY.md), re-expressed Spark-first and widened
into a full analytics surface: relational operators, window functions,
streaming, UDFs, and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) — all designed for 100 TB
scale on a real cluster while testable on local[N].

Layout:
    session      SparkSession factory (AQE on, UTC, Arrow on)
    io           readers (parquet/csv/json/binary), writers, REST sink
    functions    expression-level helpers (null handling, packing, text,
                 vectors) — thin, columnar, no row-at-a-time Python
    operators    composed DataFrame operators (joins, dedup, similarity,
                 multimodal)
    plans        pipeline driver (reference EP1 parity)
    streaming    Structured Streaming ops over the events table
    queries      the registered query surface: every operator exposed as
                 a named (spark, sf_dir) -> DataFrame callable plus a
                 DuckDB oracle SQL string for the correctness harness
"""

from supabase_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
