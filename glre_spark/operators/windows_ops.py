"""Window functions + batch event windowing (SURVEY.md §2.5, §2.10).

Tumbling/sliding/session windows are implemented over the batch `events`
table with the same Spark primitives a readStream would use — identical
code paths under Structured Streaming (streaming wiring in
glre_spark/streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glre_spark.operators import cents, fround, load, op


@op(
    "win_rownum_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def win_rownum_topk(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@op(
    "win_rank_dense",
    """SELECT s_suppkey, s_name,
              CAST(dense_rank() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS bal_rank
       FROM supplier""",
)
def win_rank_dense(spark, sf_dir):
    w = Window.orderBy(F.desc("s_acctbal"))
    return load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.dense_rank().over(w).cast("bigint").alias("bal_rank")
    )


@op(
    "win_lag_lead",
    """SELECT event_id, user_id,
              ROUND(value - lag(value) OVER w + 1e-9, 2) + 0 AS delta_prev,
              ROUND(lead(value) OVER w - value + 1e-9, 2) + 0 AS delta_next
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def win_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        fround(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        fround(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )


@op(
    "win_frame_agg",
    """SELECT event_id, user_id,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100.0
                    + 1e-9, 2) + 0 AS sliding_sum,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                    + 1e-9, 2) + 0 AS running_sum
       FROM events""",
)
def win_frame_agg(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        fround(F.sum(cents(F.col("value"))).over(w.rowsBetween(-3, 0)) / 100.0, 2).alias(
            "sliding_sum"
        ),
        fround(
            F.sum(cents(F.col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
            / 100.0,
            2,
        ).alias("running_sum"),
    )


@op(
    "win_ntile_pct",
    """SELECT o_orderkey,
              ROUND(percent_rank() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice) + 1e-9, 6) + 0 AS pct,
              CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
       FROM orders""",
)
def win_ntile_pct(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wt = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        fround(F.percent_rank().over(w), 6).alias("pct"),
        F.ntile(4).over(wt).cast("bigint").alias("quartile"),
    )


@op(
    "win_tumbling",
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
              CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 + 1e-9, 2) + 0 AS sum_value
       FROM events GROUP BY 1, 2""",
)
def win_tumbling(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            fround(F.sum(cents(F.col("value"))) / 100.0, 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


@op(
    "win_sliding",
    """WITH slid AS (
         SELECT time_bucket(INTERVAL '5 minutes', ts)
                  - k.k * INTERVAL '5 minutes' AS w_start, value
         FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
       )
       SELECT w_start, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 + 1e-9, 2) + 0 AS sum_value
       FROM slid GROUP BY w_start""",
)
def win_sliding(spark, sf_dir):
    """10-minute window sliding every 5 — each event lands in 2 windows.
    Oracle expands the slide set explicitly (SURVEY.md §2.10)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            fround(F.sum(cents(F.col("value"))) / 100.0, 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "sum_value")
    )


@op(
    "win_session",
    """WITH flagged AS (
         SELECT user_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          <= INTERVAL '30 minutes'
                     THEN 0 ELSE 1 END AS new_session
         FROM events
       ), islands AS (
         SELECT user_id, ts, value,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
         FROM flagged
       )
       SELECT user_id, MIN(ts) AS session_start,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 + 1e-9, 2) + 0 AS sum_value
       FROM islands GROUP BY user_id, session_no""",
)
def win_session(spark, sf_dir):
    """session_window(30 min gap) per user; the oracle is the classic
    gaps-and-islands rewrite."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            fround(F.sum(cents(F.col("value"))) / 100.0, 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
