"""TPC-H-shaped relational analytics over the warehouse tables.

The engine's primary surface is the link graph, but the testdata ships
the classic warehouse tables and Spark's relational layer handles them
natively — these two queries (the TPC-H Q1 pricing summary and Q3
shipping-priority shapes) document that coverage with the repo's
cross-engine exactness discipline: every money expression is computed
per ROW in double (identical on both engines — same parquet values,
same one-expression arithmetic), rounded to BIGINT micro-units per row,
then summed exactly — no float summation-order dependence ever reaches
an aggregate.

Scale shape: Q1 is one map-side-combined groupBy over a filtered scan
(predicate pushed to parquet); Q3 is two hash equi-joins (customer is
the broadcast side at any realistic scale) + one grouped sum + a
TakeOrdered top-n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def _micros(col: F.Column) -> F.Column:
    return F.round(col * MICROS).cast("long")


def pricing_summary(
    lineitem: DataFrame, ship_cutoff: str = "1998-09-01"
) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) over lineitem shipped
    on/before the cutoff — exact micro-unit sums and a row count."""
    li = lineitem.where(
        F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_micros(F.col("l_quantity"))).alias("sum_qty_micros"),
            F.sum(_micros(F.col("l_extendedprice"))).alias(
                "sum_base_micros"
            ),
            F.sum(_micros(disc)).alias("sum_disc_micros"),
            F.sum(_micros(charge)).alias("sum_charge_micros"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-n undelivered orders of one market segment by
    exact micro-unit revenue; (revenue DESC, orderkey ASC) is a total
    order, so the top-n is deterministic."""
    d = F.lit(date).cast("timestamp")
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < d).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > d).select(
        "l_orderkey",
        _micros(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("rev_m"),
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_m").cast("long").alias("revenue_micros"))
        .orderBy(F.desc("revenue_micros"), F.asc("o_orderkey"))
        .limit(n)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where customer and supplier
    share the nation, one region, one order-date year — the six-table
    join exercising every warehouse dimension.  Revenue in exact
    micro-units (per-row rounding before the sum); nation/region
    dimensions are broadcast-sized at any scale."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    rev = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        region.where(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            customer, F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= lo)
            & (F.col("o_orderdate") < hi),
        )
        .join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_suppkey") == F.col("s_suppkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("long").alias("revenue_micros"))
    )


def revenue_forecast(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    discount: float = 0.05,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue delta of dropping discounts
    in a band (discount +/- 0.01) for small orders over one shipping
    year — ONE row, sum(extendedprice * discount) in exact micro-units.

    Scale shape: the best case the engine can present — every predicate
    (shipdate range, discount band, quantity cap) pushes to the parquet
    scan, the projection prunes to three columns, and the single global
    sum is map-side-combined to one partial per task.  No join, no wide
    shuffle, no skew axis; at 100 TB this is I/O-bound by construction.
    Discount bounds compare the same parquet doubles against the same
    decimal literals on both engines, so the band is bit-identical."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    li = lineitem.where(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= discount - 0.01)
        & (F.col("l_discount") <= discount + 0.01)
        & (F.col("l_quantity") < max_qty)
    )
    return li.agg(
        F.coalesce(
            F.sum(_micros(F.col("l_extendedprice") * F.col("l_discount"))),
            F.lit(0),
        )
        .cast("long")
        .alias("revenue_micros")
    )
