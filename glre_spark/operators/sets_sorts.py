"""Set operations, sorts, limits, sampling (SURVEY.md §2.6-2.7)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glre_spark.operators import load, op
from glre_spark.operators.scans import PAGES_CTE, pages_view


@op(
    "set_union",
    PAGES_CTE
    + """SELECT url, lang FROM pages WHERE lang = 'de'
         UNION
         SELECT url, lang FROM pages WHERE lang = 'fr'""",
)
def set_union(spark, sf_dir):
    p = pages_view(spark, sf_dir)
    return (
        p.filter("lang = 'de'")
        .select("url", "lang")
        .unionByName(p.filter("lang = 'fr'").select("url", "lang"))
        .distinct()
    )


@op(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def set_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter("o_orderstatus = 'O'")
        .select("o_custkey")
        .intersect(o.filter("o_orderstatus = 'F'").select("o_custkey"))
    )


@op(
    "set_except",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey AS c_custkey FROM orders""",
)
def set_except(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ordered = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.exceptAll(ordered).distinct()


@op(
    "sort_global",
    """SELECT n_name, n_regionkey,
              CAST(row_number() OVER (ORDER BY n_regionkey, n_name) AS BIGINT) AS pos
       FROM nation""",
)
def sort_global(spark, sf_dir):
    """Global sort; the order is materialized into a rank column so the
    driver's order-insensitive hash still verifies it."""
    w = Window.orderBy("n_regionkey", "n_name")
    return (
        load(spark, sf_dir, "nation")
        .select("n_name", "n_regionkey", F.row_number().over(w).cast("bigint").alias("pos"))
        .orderBy("pos")
    )


@op(
    "limit_topn",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def limit_topn(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@op("sample_frac", None)  # engine-specific sampling → rows-only check
def sample_frac(spark, sf_dir):
    return load(spark, sf_dir, "orders").sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_custkey"
    )


@op(
    "split_holdout",
    """SELECT doc_id,
              CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::UBIGINT
                        % 100 < 5
                   THEN 'val' ELSE 'train' END AS split,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8))::UBIGINT
                   % 16 AS INTEGER) AS shard
       FROM documents""",
)
def split_holdout(spark, sf_dir):
    """Deterministic hash-based corpus splits — the reproducible
    train/holdout assignment a training-data pipeline needs at 100 TB,
    where ``sample_frac``-style engine RNG cannot give two jobs (or two
    engines) the same split. Key-hash → bucket: stable under reruns,
    repartitioning, engine choice, and corpus growth (a doc's split never
    changes when other docs are added). md5-derived 32-bit buckets with
    per-purpose salts (':split' vs ':shard') keep the two assignments
    independent; both are bit-identical in DuckDB (hex-prefix → integer,
    same convention as the MinHash family)."""

    def bucket(salt: str, mod: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(mod))

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(bucket(":split", 100) < 5, "val").otherwise("train").alias("split"),
        bucket(":shard", 16).cast("int").alias("shard"),
    )
