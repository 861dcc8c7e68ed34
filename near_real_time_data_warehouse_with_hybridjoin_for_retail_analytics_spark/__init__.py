"""PySpark-native near-real-time retail analytics warehouse.

A ground-up Spark rebuild of the capabilities of the reference system
``batoolrrizvi/Near-Real-Time-Data-Warehouse-with-HybridJoin-for-Retail-Analytics``
(surveyed in ``SURVEY.md``): a star-schema warehouse, a streaming
HYBRIDJOIN-style enrichment ETL, a 20-query OLAP surface, and a
parameterized serving layer — re-expressed as idiomatic Spark
(DataFrame/SQL/Catalyst/Structured Streaming), plus the large-scale
data-pipeline operators (dedup, similarity search, text analysis)
that a 100 TB deployment of such an engine needs.

Layout:
    session      SparkSession factory with scale-oriented defaults
    catalog      testdata/warehouse table loading + view registry
    functions/   shared column-expression helpers (dates, money, text, vectors)
    plans/       the query surface (testdata-dialect graded queries,
                 warehouse-faithful queries, parameterized serving)
    etl/         batch dimension builds + date dimension
    streaming/   Structured Streaming enrichment pipeline (HYBRIDJOIN parity)
    operators/   beyond-reference ops: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"
