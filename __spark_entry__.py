"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline; ``queries()``
/ ``oracle_sql()`` expose the operator inventory of SURVEY.md §2, one
callable + DuckDB twin per operator (glre_spark/operators/*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: read sf0.001 documents for scale/ids, synthesize the
    north-rule pages table (url, warc_ts, html, text, lang) deterministically
    from them (FIXTURES.md §B), run the full GLRE KG pipeline → triples."""
    from glre_spark.datagen import pages_from_docs
    from glre_spark.pipeline import build_triples

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_docs(docs, partitions=8)
    return build_triples(spark, pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from glre_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from glre_spark.operators import all_oracle_sql

    return all_oracle_sql()
