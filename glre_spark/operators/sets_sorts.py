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


@op(
    "sample_frac",
    # Twin design (r6; was rows-only): the sampled ROWS are engine-RNG-
    # specific and can never hash-match, so — like agg_approx_distinct —
    # each engine referees ITS OWN sample and the hashed surface is the
    # deterministic verdict: source count, the sampled fraction inside a
    # 5-sigma binomial band, and bernoulli's no-duplicates property.
    """WITH s AS (SELECT o_orderkey FROM orders USING SAMPLE 10 PERCENT (bernoulli, 42)),
src AS (SELECT COUNT(*) AS n_source FROM orders),
sm AS (SELECT COUNT(*) AS n_sampled, COUNT(DISTINCT o_orderkey) AS n_distinct FROM s)
SELECT CAST(n_source AS BIGINT) AS n_source,
       abs(n_sampled - 0.1 * n_source) <= ceil(5 * sqrt(n_source * 0.09))
           AS frac_within_tol,
       n_sampled = n_distinct AS no_duplicates
FROM src, sm""",
)
def sample_frac(spark, sf_dir):
    """Bernoulli row sampling refereed in-query: `.sample(0.1)` is the
    production path (a plain per-row coin flip — no shuffle at any
    scale); the checked surface verifies the drawn fraction lands inside
    5 sigma of Binomial(n_source, 0.1) and that no row was drawn twice.
    For REPRODUCIBLE sampling (stable across engines/reruns/growth) use
    split_holdout's salted-hash idiom instead — engine RNG cannot give
    that, which is exactly why this op's twin referees rather than
    compares rows."""
    orders = load(spark, sf_dir, "orders")
    samp = orders.sample(fraction=0.1, seed=42).select("o_orderkey")
    src = orders.agg(F.count("*").alias("n_source"))
    sm = samp.agg(
        F.count("*").alias("n_sampled"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
    )
    tol = F.ceil(5 * F.sqrt(F.col("n_source") * 0.09))
    return src.crossJoin(sm).select(
        F.col("n_source").cast("bigint").alias("n_source"),
        (F.abs(F.col("n_sampled") - 0.1 * F.col("n_source")) <= tol).alias(
            "frac_within_tol"
        ),
        (F.col("n_sampled") == F.col("n_distinct")).alias("no_duplicates"),
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
