"""Date-part derivations (SURVEY §2.2 P7/P8, reference hybridjoin.py:137-199).

The reference derives day/month/year/dayofweek/quarter/is_weekend in
Python per-row; here every derivation is a Catalyst expression so it
stays inside whole-stage codegen. All int parts are cast to IntegerType
explicitly so Spark and DuckDB oracle schemas line up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-format permissive date parse (reference hybridjoin.py:137-147).
# The reference falls back to *today* for unparseable dates — nondeterministic;
# we deviate deliberately (SURVEY §7.2) to NULL so downstream can quarantine.
DATE_FORMATS = ("yyyy-MM-dd", "dd-MM-yyyy", "MM/dd/yyyy", "yyyy/MM/dd")


def parse_date_multi(c: Column | str) -> Column:
    """Try each known format in order; NULL if none parse.

    try_to_date (not to_date): Spark 4 raises on unparseable input under
    the default ANSI policy, but the reference tolerates garbage dates.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(*[F.try_to_date(col, fmt) for fmt in DATE_FORMATS])


def year_i(c) -> Column:
    return F.year(c).cast("int")


def month_i(c) -> Column:
    return F.month(c).cast("int")


def day_i(c) -> Column:
    return F.dayofmonth(c).cast("int")


def quarter_i(c) -> Column:
    return F.quarter(c).cast("int")


def day_name(c) -> Column:
    """Full English day name (reference uses strftime('%A'))."""
    return F.date_format(c, "EEEE")


def is_weekend(c) -> Column:
    """Sat/Sun flag. Spark dayofweek: 1=Sunday … 7=Saturday."""
    return F.dayofweek(c).isin(1, 7)


def season(c) -> Column:
    """Meteorological season bucket from month (reference queries.sql:186-196)."""
    m = F.month(c)
    return (
        F.when(m.isin(12, 1, 2), F.lit("Winter"))
        .when(m.isin(3, 4, 5), F.lit("Spring"))
        .when(m.isin(6, 7, 8), F.lit("Summer"))
        .otherwise(F.lit("Fall"))
    )


def with_date_parts(df: DataFrame, date_col: str, prefix: str = "") -> DataFrame:
    """Attach the full date-dimension attribute set derived from date_col."""
    c = F.col(date_col)
    return df.withColumns(
        {
            f"{prefix}year": year_i(c),
            f"{prefix}monthnum": month_i(c),
            f"{prefix}daynum": day_i(c),
            f"{prefix}quarter_num": quarter_i(c),
            f"{prefix}dayofweek": day_name(c),
            f"{prefix}is_weekend": is_weekend(c),
        }
    )
