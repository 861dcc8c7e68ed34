"""Central registry for the graded query surface.

Every capability exposes itself as a named (spark, sf_dir) -> DataFrame
callable, optionally paired with a DuckDB oracle SQL string. The driver
contract (__spark_entry__.py) serves these dicts directly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` means rows-only verification
    (genuinely non-SQL-expressible or float-order-nondeterministic ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
