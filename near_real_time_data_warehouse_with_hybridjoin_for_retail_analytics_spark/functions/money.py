"""Deterministic money aggregation.

Floating-point SUM is not associative, so a parallel Spark sum of
doubles and a DuckDB oracle sum of the same doubles can differ in the
last bits — enough to break value-hash comparison. Every money
aggregate therefore routes through an exact DECIMAL(18,4) cast:
decimal addition is exact and order-independent, so Spark (any
partitioning) and the oracle produce bitwise-identical results; the
final cast back to DOUBLE is correctly rounded on both engines.

This also mirrors the reference warehouse's NUMERIC(12,2) money type
(star_schema.sql:30,63) — money is decimal, not float.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(c: Column | str) -> Column:
    """Exact-decimal view of a money column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Order-independent SUM of a money column, emitted as double."""
    return F.sum(dec(c)).cast("double")


def dsum_if(cond: Column, c: Column | str) -> Column:
    """Conditional SUM (NULL else-branch preserved, SURVEY §2.4 A4)."""
    return F.sum(F.when(cond, dec(c))).cast("double")


def davg(c: Column | str) -> Column:
    """AVG as exact-sum / count — deterministic double on both engines."""
    return F.sum(dec(c)).cast("double") / F.count(F.lit(1))


def lsum(c: Column | str) -> Column:
    """SUM of an integral measure as bigint (l_quantity is stored double)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast("long"))


def lsum_if(cond: Column, c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(F.when(cond, col.cast("long")))


# Oracle-side (DuckDB SQL) equivalents, kept adjacent so the two
# dialects can't drift: format with the raw column expression.
SQL_DSUM = "CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE)"
SQL_DSUM_IF = "CAST(SUM(CASE WHEN {cond} THEN CAST({c} AS DECIMAL(18,4)) END) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
SQL_LSUM = "CAST(SUM(CAST({c} AS BIGINT)) AS BIGINT)"
SQL_LSUM_IF = "CAST(SUM(CASE WHEN {cond} THEN CAST({c} AS BIGINT) END) AS BIGINT)"
