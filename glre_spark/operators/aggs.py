"""Aggregation operators (SURVEY.md §2.4).

All hash aggregations get map-side partial aggregation from Spark for
free; counts are cast to BIGINT on both sides (DuckDB SUM/COUNT width
quirks) and float aggregates are rounded so the driver's value-hash is
ulp-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glre_spark.operators import cents, fround, load, op


@op(
    "agg_groupby",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity) + 1e-9, 2) + 0 AS sum_qty,
              ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    / 10000.0 + 1e-9, 2) + 0 AS revenue,
              ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
                    / (COUNT(*) * 100.0) + 1e-9, 4) + 0 AS avg_disc,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def agg_groupby(spark, sf_dir):
    """TPC-H Q1 shape. Money aggregates are lifted to exact integer cents
    before SUM (float sum order is engine/partition-dependent) — the
    scale-safe convention for every hash-compared money aggregate."""
    disc_c = cents(F.col("l_discount"))
    price_c = cents(F.col("l_extendedprice"))
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("sum_qty"),
            fround(F.sum(price_c * (100 - disc_c)) / 10000.0, 2).alias("revenue"),
            fround(F.sum(disc_c) / (F.count("*") * 100.0), 4).alias("avg_disc"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


@op(
    "agg_count_distinct",
    """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
       FROM orders GROUP BY o_orderpriority""",
)
def agg_count_distinct(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("n_cust"))
    )


_APPROX_BOUND = 0.1  # ≥5σ for rsd=0.02 HLL++ — and comfortably above
                     # DuckDB's default-precision HLL error too


@op(
    "agg_approx_distinct",
    f"""SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
              CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
                <= {_APPROX_BOUND} * COUNT(DISTINCT l_orderkey) AS orders_within_rsd,
              abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
                <= {_APPROX_BOUND} * COUNT(DISTINCT l_partkey) AS parts_within_rsd
       FROM lineitem""",
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct — the 10^12-scale cardinality path (HLL++;
    exact distinct is a shuffle bomb at north-rule scale).

    Twin design (r6; was rows-only): the ESTIMATES are engine-specific
    (Spark HLL++ vs DuckDB HLL), so they can never hash-match — instead
    each engine referees its own estimator against its own exact count
    and the hashed surface is (exact cardinalities + a within-bound
    boolean per column). That pushes the tolerance check INSIDE the
    query, where the driver's exact row-hash gate can see it (VERDICT r5
    next-round #8). The exact counts exist only to referee at test
    scale; the production path is the estimator alone."""
    li = load(spark, sf_dir, "lineitem")
    exact_o = F.countDistinct("l_orderkey").cast("bigint")
    exact_p = F.countDistinct("l_partkey").cast("bigint")
    appr_o = F.approx_count_distinct("l_orderkey", 0.02)
    appr_p = F.approx_count_distinct("l_partkey", 0.02)
    return li.agg(
        exact_o.alias("exact_orders"),
        exact_p.alias("exact_parts"),
        (F.abs(appr_o - exact_o) <= F.lit(_APPROX_BOUND) * exact_o).alias(
            "orders_within_rsd"
        ),
        (F.abs(appr_p - exact_p) <= F.lit(_APPROX_BOUND) * exact_p).alias(
            "parts_within_rsd"
        ),
    )


@op(
    "agg_collect_list",
    """SELECT o_custkey,
              string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
              CAST(COUNT(*) AS BIGINT) AS n_orders
       FROM orders GROUP BY o_custkey""",
)
def agg_collect_list(spark, sf_dir):
    """collect_list with a deterministic order fix (array_sort) — compared
    as a joined string so both engines hash identical values."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("order_keys"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )


@op(
    "agg_grouping_sets",
    """SELECT n_regionkey, n_nationkey, CAST(COUNT(*) AS BIGINT) AS n
       FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey)""",
)
def agg_grouping_sets(spark, sf_dir):
    return (
        load(spark, sf_dir, "nation")
        .rollup("n_regionkey", "n_nationkey")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@op(
    "agg_pivot",
    """SELECT o_orderpriority,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_O,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_F,
              CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_P
       FROM orders GROUP BY o_orderpriority""",
)
def agg_pivot(spark, sf_dir):
    piv = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("st_O"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("st_F"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("st_P"),
    )


@op(
    "agg_distinct_rows",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def agg_distinct_rows(spark, sf_dir):
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@op(
    "agg_percentiles",
    # Exact interpolated quantiles agree bit-for-bit across engines
    # (verified: Spark `percentile` and DuckDB `quantile_cont` implement
    # the same linear interpolation); the approximate estimators are
    # engine-specific sketches, so each engine referees ITS OWN estimate
    # against its own exact value (the agg_approx_distinct pattern).
    """SELECT ROUND(q[1] + 1e-9, 4) + 0 AS p50,
              ROUND(q[2] + 1e-9, 4) + 0 AS p90,
              ROUND(q[3] + 1e-9, 4) + 0 AS p99,
              abs(a50 - q[1]) <= 0.05 * q[1] AS p50_within,
              abs(a90 - q[2]) <= 0.05 * q[2] AS p90_within,
              abs(a99 - q[3]) <= 0.05 * q[3] AS p99_within
       FROM (SELECT quantile_cont(length(text), [0.5, 0.9, 0.99]) AS q,
                    approx_quantile(length(text), 0.5) AS a50,
                    approx_quantile(length(text), 0.9) AS a90,
                    approx_quantile(length(text), 0.99) AS a99
             FROM documents)""",
)
def agg_percentiles(spark, sf_dir):
    """Doc-length percentiles — the aggregate a filtering pipeline runs
    to PICK its length thresholds before hard-coding them. Production
    path at 10^12 docs is percentile_approx (a mergeable sketch, one
    pass, map-side combinable); the exact interpolated percentile exists
    to referee it at test scale, and the hashed surface is (exact
    quantiles + each engine's own within-5% verdicts)."""
    docs = load(spark, sf_dir, "documents").select(
        F.length("text").cast("double").alias("n")
    )
    agg = docs.agg(
        F.expr("percentile(n, array(0.5, 0.9, 0.99))").alias("q"),
        F.expr("percentile_approx(n, array(0.5, 0.9, 0.99), 10000)").alias("a"),
    )
    q = lambda i: F.col("q").getItem(i)  # noqa: E731
    a = lambda i: F.col("a").getItem(i)  # noqa: E731
    return agg.select(
        fround(q(0), 4).alias("p50"),
        fround(q(1), 4).alias("p90"),
        fround(q(2), 4).alias("p99"),
        (F.abs(a(0) - q(0)) <= 0.05 * q(0)).alias("p50_within"),
        (F.abs(a(1) - q(1)) <= 0.05 * q(1)).alias("p90_within"),
        (F.abs(a(2) - q(2)) <= 0.05 * q(2)).alias("p99_within"),
    )
