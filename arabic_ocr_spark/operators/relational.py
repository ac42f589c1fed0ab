"""Relational operators over the star schema — the §2.7 surface the
extraction engine's DataFrame shell uses (filter/project, hash aggregate,
broadcast join, window), demonstrated on the driver's TPC-H-ish tables so
the DuckDB oracle can verify them.

Scale shapes: the pricing summary is a map-side-combinable aggregate on a
low-cardinality key (no skew); the customer/nation join broadcasts the tiny
dimension (no shuffle of the fact side); the events rollup buckets by hour
(bounded state, streaming-friendly — the Structured Streaming variant uses
the same expression over a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pricing_summary", "orders_by_nation", "events_hourly"]


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-flavoured rollup: returnflag/linestatus aggregate with
    derived measures (all map-side partial-agg friendly)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def orders_by_nation(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Fact-to-dims join with explicit broadcast of the small dimensions:
    order counts and revenue per nation."""
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup by event type (date_trunc is portable to the
    oracle; the streaming job reuses this expression with a watermark)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
