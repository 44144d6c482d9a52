"""Shared expression helpers for oracle-deterministic queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact decimal accumulator: wide enough for sf0.1 sums of ~1e9-scale
# money values at 6 fractional digits; cast back to double at the end so
# the published schema stays double. decimal sums are order-independent,
# which makes Spark(parallel) == DuckDB(sequential) bit-for-bit.
DEC = "decimal(28,6)"


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent double sum: sum(cast(expr as decimal)) -> double."""
    return F.sum(expr.cast(DEC)).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Order-independent double average via exact decimal sum / count."""
    return (F.sum(expr.cast(DEC)).cast("double") / F.count(expr)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
