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


def priority_late_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: orders placed in one quarter that had at least
    one lineitem shipped AFTER the order date (the schema's late-ship
    indicator — the testdata carries no commit/receipt dates), counted
    per order priority.

    Scale shape: the EXISTS is a LEFT SEMI hash join on l_orderkey —
    the probe side never duplicates orders however many lineitems
    match; both date predicates push to the parquet scans."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    o = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


def nation_pair_volume(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between every ORDERED pair of
    distinct nations (supplier nation -> customer nation) per ship
    year — the two-sided dimension join (nation enters twice under
    different roles).

    Scale shape: nation is broadcast on both sides; the fact-side work
    is two fact-fact equi-joins (lineitem->orders, ->supplier rosters)
    keyed on their natural keys; the final groupBy is map-side combined
    over a (nation, nation, year) key space that is dimension-sized."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        _micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_m"
        ),
    )
    return (
        li.join(supplier.select("s_suppkey", "s_nationkey"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_m").cast("long").alias("revenue_micros"))
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-n customers by revenue lost to returns
    (l_returnflag = 'R') on orders from one quarter.

    Scale shape: order-date predicate pushes to the orders scan and the
    returnflag predicate to the lineitem scan BEFORE either join;
    nation broadcasts; (revenue DESC, custkey ASC) is a total order so
    the TakeOrderedAndProject top-n is deterministic."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    o = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        _micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_m"
        ),
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_name", "c_acctbal",
                              "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("rev_m").cast("long").alias("revenue_micros"),
            F.max(_micros(F.col("c_acctbal"))).alias("acctbal_micros"),
        )
        .orderBy(F.desc("revenue_micros"), F.asc("c_custkey"))
        .limit(n)
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k orders, for
    every k INCLUDING ZERO — the outer-join histogram.

    Scale shape: one LEFT OUTER equi-join (never-ordered customers kept
    as null order keys), one per-customer count, one map-side-combined
    histogram groupBy whose key space is the max order count."""
    per = (
        customer.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def promo_revenue_effect(
    lineitem: DataFrame,
    part: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-02-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: the share of one month's revenue that came from
    promotional parts — one row (promo_micros, total_micros,
    promo_pct_micros).

    The percentage is the exact 128-bit integral quotient
    ``(100 · 10^6 · promo) div total`` — Spark evaluates it in
    DECIMAL(38,0) ``div``, DuckDB in HUGEINT ``//``; the result fits a
    BIGINT (≤ 10^8), so both engines agree bit-for-bit where a float
    ratio would not.

    Scale shape: the ship-date predicate pushes to the lineitem scan;
    part joins on its key (broadcast-sized next to the fact side); one
    global conditional sum, map-side combined."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    li = lineitem.where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select(
        "l_partkey",
        _micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_m"
        ),
    )
    j = li.join(
        part.select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    agg = j.agg(
        F.coalesce(
            F.sum(F.when(F.col("p_type") == promo_type, F.col("rev_m"))),
            F.lit(0),
        )
        .cast("long")
        .alias("promo_micros"),
        F.coalesce(F.sum("rev_m"), F.lit(0)).cast("long").alias(
            "total_micros"
        ),
    )
    return agg.select(
        "promo_micros",
        "total_micros",
        F.when(F.col("total_micros") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST((CAST(promo_micros AS DECIMAL(38,0)) * 100000000)"
                " div total_micros AS BIGINT)"
            )
        )
        .alias("promo_pct_micros"),
    )


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose one-quarter revenue equals
    the maximum — ties all kept, per the spec.

    Scale shape: one filtered fact aggregate per supplier, then a 1-ROW
    global max broadcast back as the filter (the eigenvector-
    normalization pattern) — no window over the full supplier set, no
    second fact scan."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("long")
            .alias("total_revenue_micros")
        )
    )
    mx = rev.agg(F.max("total_revenue_micros").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue_micros") == F.col("mx"))
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue_micros")
    )


def market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    nation_name: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "ECONOMY",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue
    for one part type, per order year — the conditional-share rollup
    over the full dimension snowflake.

    The share is the exact 128-bit integral quotient
    ``(10^6 · nation) div total`` (DECIMAL(38,0) ``div`` on Spark,
    HUGEINT ``//`` in DuckDB) so both engines agree bit-for-bit.

    Scale shape: part/region/nation filters prune their scans BEFORE
    any fact work; part, supplier-roster, nation, and region all
    broadcast next to the fact side; one (year)-keyed map-side-combined
    rollup at the end.  No predicate touches more than one fact pass."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    p = part.where(F.col("p_type") == part_type).select("p_partkey")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cust_region = (
        region.where(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_m"
        ),
    )
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cust_region),
            F.col("c_nationkey") == F.col("cn_key"),
            "left_semi",
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = j.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("supp_nation") == nation_name, F.col("rev_m"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("nation_micros"),
        F.sum("rev_m").cast("long").alias("total_micros"),
    )
    return agg.select(
        "o_year",
        "nation_micros",
        "total_micros",
        F.when(F.col("total_micros") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST((CAST(nation_micros AS DECIMAL(38,0)) * 1000000)"
                " div total_micros AS BIGINT)"
            )
        )
        .alias("share_micros"),
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#11",
    frac_den: int = 5,
    years: int = 7,
) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems whose
    quantity is below 1/``frac_den`` of their part's average quantity,
    one row of (total, per-year) micros.

    The correlated ``avg`` is made exact: ``qty < (1/5)·(sum/cnt)``
    is evaluated as the BIGINT cross-product test
    ``qty_m · cnt · 5 < sum_qty_m`` — no float division on either
    engine, so the boundary rows agree bit-for-bit.  The per-year figure
    is the exact integral quotient (DECIMAL(38,0) div / HUGEINT //).

    Scale shape: the brand filter prunes part to a broadcast sliver;
    the fact table is touched twice but both passes are brand-semi-
    joined first (a fraction of a percent of the fact rows); the
    per-part average is a map-side-combined rollup on l_partkey."""
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).select(
        "l_partkey",
        _micros(F.col("l_quantity")).alias("qty_m"),
        _micros(F.col("l_extendedprice")).alias("price_m"),
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("qty_m").cast("long").alias("sum_qty_m"),
    )
    small = li.join(per_part, F.col("l_partkey") == F.col("pk")).where(
        F.col("qty_m") * F.col("cnt") * frac_den < F.col("sum_qty_m")
    )
    agg = small.agg(
        F.coalesce(F.sum("price_m"), F.lit(0))
        .cast("long")
        .alias("total_micros")
    )
    return agg.select(
        "total_micros",
        F.expr(
            f"CAST(CAST(total_micros AS DECIMAL(38,0)) div {years}"
            " AS BIGINT)"
        ).alias("avg_yearly_micros"),
    )


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    cases: tuple[tuple[str, int, int, int], ...] = (
        ("Brand#12", 15, 1, 11),
        ("Brand#21", 20, 10, 20),
        ("Brand#25", 25, 20, 30),
    ),
) -> DataFrame:
    """TPC-H Q19 shape: one revenue sum under a DISJUNCTION of
    (brand, size-range, quantity-range) cases — the classic test that
    an OR-of-conjunctions still pushes its hull predicates down instead
    of degrading to a full-scan join.

    Scale shape: the hull of the disjunction (brand IN-list, size ≤
    max, quantity within the overall band) is applied to each side
    BEFORE the equi-join — those hull predicates reach the parquet
    scans — and part broadcasts; the exact OR is then a post-join
    filter over the already-pruned sliver.  The join key stays the pure
    p_partkey equi-join (no OR in the join condition, so no nested
    loop)."""
    brands = [b for b, _, _, _ in cases]
    max_size = max(sz for _, sz, _, _ in cases)
    qty_lo = min(lo for _, _, lo, _ in cases)
    qty_hi = max(hi for _, _, _, hi in cases)
    p = part.where(
        F.col("p_brand").isin(brands)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    li = lineitem.where(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select(
        "l_partkey",
        "l_quantity",
        _micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_m"
        ),
    )
    disj = None
    for brand, size_hi, lo, hi in cases:
        arm = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        disj = arm if disj is None else (disj | arm)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(disj)
        .agg(
            F.coalesce(F.sum("rev_m"), F.lit(0))
            .cast("long")
            .alias("revenue_micros")
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    late_days: int = 30,
    status: str = "F",
    n: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finalized order ("kept the order waiting"), counted
    and top-n'd.  Lateness is ``l_shipdate > o_orderdate + late_days``
    (the schema carries no commit/receipt dates — same adaptation as
    Q4, stated).

    The spec's EXISTS(other supplier) / NOT EXISTS(other LATE supplier)
    double correlated subquery is rewritten as one grouped pass: per
    (order, supplier) fold lateness with bool_or, per order count
    suppliers and late suppliers, and a supplier qualifies where it is
    late, the order has >1 suppliers, and exactly 1 late one.  Exact —
    same set as the double EXISTS — and hash-joinable.

    Scale shape: the status filter pushes to the orders scan; the only
    fact-fact work is one equi-join + two map-side-combined rollups on
    l_orderkey prefixes (bounded per-order group sizes, no skew axis);
    supplier and nation broadcast; (numwait DESC, s_name ASC) is a
    total order so the top-n is deterministic."""
    o = orders.where(F.col("o_orderstatus") == status).select(
        "o_orderkey", "o_orderdate"
    )
    per_pair = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.bool_or(
                F.col("l_shipdate")
                > F.expr(f"o_orderdate + INTERVAL {int(late_days)} DAY")
            ).alias("late")
        )
    )
    per_order = per_pair.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum(F.col("late").cast("long")).cast("long").alias("n_late"),
    )
    qualifying = per_pair.join(
        per_order, F.col("l_orderkey") == F.col("ok")
    ).where(
        F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    return (
        qualifying.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(
            F.broadcast(
                supplier.select("s_suppkey", "s_name", "s_nationkey").join(
                    F.broadcast(nation.select("n_nationkey", "n_name")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "n_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(n)
    )


def dormant_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    cutoff: str = "1999-01-01",
    nation_keys: tuple[int, ...] = (0, 2, 4, 6, 8, 10, 12),
) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average-
    balance customers with NO recent orders — the scalar-subquery +
    anti-join acquisition report.  (The spec's phone-prefix IN-list
    becomes a nationkey IN-list; the schema carries no phone column.)

    The global average is made exact: ``acctbal > avg(positive
    acctbals)`` is evaluated as ``acctbal_m · cnt > sum_m`` in BIGINT —
    the 1-row (sum, cnt) aggregate broadcasts back (the Q15 /
    eigenvector-normalization pattern), so no float average is ever
    compared on either engine.

    Scale shape: the nation IN-list prunes the customer scan; the
    recent-order anti-join is a LEFT ANTI hash join on o_custkey with
    the date predicate pushed to the orders scan; the only non-equi
    join is the 1-row stats broadcast."""
    d = F.lit(cutoff).cast("timestamp")
    c = customer.where(
        F.col("c_nationkey").isin(list(nation_keys))
    ).select(
        "c_custkey",
        "c_nationkey",
        _micros(F.col("c_acctbal")).alias("acctbal_m"),
    )
    stats = c.where(F.col("acctbal_m") > 0).agg(
        F.coalesce(F.sum("acctbal_m"), F.lit(0)).cast("long").alias("sum_m"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    recent = orders.where(F.col("o_orderdate") >= d).select("o_custkey")
    return (
        c.join(F.broadcast(stats))
        .where(F.col("acctbal_m") * F.col("cnt") > F.col("sum_m"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("acctbal_m").cast("long").alias("totacctbal_micros"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 300,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds the
    threshold, with their customer — the HAVING-filtered fact rollup.

    Scale shape: the quantity rollup groups the fact table on its own
    primary-key prefix (l_orderkey) — map-side combined, no skew axis
    (order sizes are bounded); the HAVING filter shrinks the result to
    a sliver BEFORE the dimension joins."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_micros(F.col("l_quantity"))).alias("sum_qty_micros"))
        .where(F.col("sum_qty_micros") > min_qty * MICROS)
    )
    return (
        qty.join(
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _micros(F.col("o_totalprice")).alias("totalprice_micros"),
            F.col("sum_qty_micros").cast("long").alias("sum_qty_micros"),
        )
    )


# ---------------------------------------------------------------------------
# derived partsupp + the TPC-H shapes that need it (Q2/Q9/Q11/Q16/Q20)
# ---------------------------------------------------------------------------
#
# The testdata carries no partsupp table, so the engine DERIVES one,
# deterministically and engine-identically, from the tables it has:
#
#   * assignment — each part gets 4 suppliers at consecutive residues
#     (p_partkey*4 + i) % S, i in 0..3 (distinct for any S >= 4; the
#     dbgen idea of a fixed per-part supplier set without its modular
#     collision edge cases), UNIONed with every (l_partkey, l_suppkey)
#     pair observed in lineitem — preserving TPC-H's invariant that a
#     lineitem's pair always exists in partsupp.
#   * attributes — ps_availqty in [1, 9999] and ps_supplycost_micros in
#     [1.00, 1000.00] carved from the shared 48-bit md5 of the pair, so
#     the DuckDB oracle re-derives bit-identical values from the same
#     parquet keys.
#
# Scale shape: the assignment arm is a zero-shuffle projection of part
# x 4 (explode over a 4-literal array; the supplier count rides as a
# broadcast single-row frame); the observed arm is one map-side-combined
# distinct over a 2-column projection of the fact table.

_PS_SEP = "\x1f"


def _ps_hash_attr(tag: str, lo: int, span: int) -> F.Column:
    from graphlite_spark.functions.hashes import hash48

    h = hash48(
        F.concat_ws(
            _PS_SEP,
            F.lit(tag),
            F.col("ps_partkey").cast("string"),
            F.col("ps_suppkey").cast("string"),
        )
    )
    return (h % span + lo).cast("long")


def derive_partsupp(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_micros) —
    the deterministic derived partsupp described in the module notes."""
    s_cnt = supplier.agg(
        F.count(F.lit(1)).cast("long").alias("s_cnt")
    )
    assigned = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            "s_cnt",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("i")) % F.col("s_cnt"))
            .cast("long")
            .alias("ps_suppkey"),
        )
    )
    observed = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").cast("long").alias("ps_suppkey"),
    )
    pairs = assigned.unionByName(observed).distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        _ps_hash_attr("psav", 1, 9999).alias("ps_availqty"),
        _ps_hash_attr("pscost", MICROS, 999 * MICROS + 1).alias(
            "ps_supplycost_micros"
        ),
    )


def min_cost_supplier(
    part: DataFrame,
    partsupp: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "ECONOMY",
    max_size: int = 25,
) -> DataFrame:
    """TPC-H Q2 shape: for every qualifying part, the region's
    suppliers quoting the MINIMUM supplycost (the correlated min
    subquery), with supplier/nation detail.

    Scale shape: nation+region collapse to a broadcast nationkey
    filter on supplier; the min is a groupBy on ps_partkey over the
    region-filtered partsupp (map-side combined) joined back — no
    window over the full pair table; part's predicates push to its
    scan and the join to parts is LEFT SEMI-sized (qualifying parts
    only)."""
    nat = (
        nation.join(
            F.broadcast(
                region.where(F.col("r_name") == region_name)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    sup = supplier.join(
        F.broadcast(nat),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    pts = part.where(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand")
    ps = partsupp.join(
        F.broadcast(sup),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).join(pts, F.col("ps_partkey") == F.col("p_partkey"))
    best = ps.groupBy(F.col("ps_partkey").alias("bk")).agg(
        F.min("ps_supplycost_micros").alias("min_cost_micros")
    )
    return (
        ps.join(
            best,
            (F.col("ps_partkey") == F.col("bk"))
            & (
                F.col("ps_supplycost_micros")
                == F.col("min_cost_micros")
            ),
        )
        .select(
            _micros(F.col("s_acctbal")).alias("acctbal_micros"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            F.col("ps_suppkey").alias("s_suppkey"),
            F.col("ps_supplycost_micros").alias("supplycost_micros"),
        )
    )


def product_type_profit(
    part: DataFrame,
    partsupp: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    name_contains: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over
    parts whose name contains the token — revenue minus the derived
    supplycost * quantity, all in exact micro-units.

    Scale shape: the fact table joins partsupp on its OWN (partkey,
    suppkey) pair — every lineitem pair exists by construction; part's
    LIKE filter semi-shrinks the fact side first; supplier->nation and
    orders' year are broadcast/equi joins; one grouped exact sum."""
    pts = part.where(
        F.col("p_name").contains(name_contains)
    ).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey")
    )
    li = li.join(
        partsupp,
        (F.col("l_partkey") == F.col("ps_partkey"))
        & (F.col("l_suppkey") == F.col("ps_suppkey")),
    )
    amount = _micros(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - F.col("ps_supplycost_micros") * F.col("l_quantity").cast(
        "long"
    )
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        li.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("long").alias("profit_micros"))
    )


def important_stock(
    partsupp: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_15",
    fraction_den: int = 500,
) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value (supplycost * availqty)
    over one nation's suppliers, keeping parts whose value exceeds
    total/fraction_den — the global-scalar HAVING.

    Scale shape: nation filter broadcasts onto supplier then partsupp;
    one map-side-combined groupBy; the total is a 1-row frame
    broadcast back (no second pass over pairs). The threshold compare
    is exact integer: value > total div den (both BIGINT)."""
    sup = supplier.join(
        F.broadcast(
            nation.where(F.col("n_name") == nation_name).select(
                "n_nationkey"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    ps = partsupp.join(
        F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_micros") * F.col("ps_availqty")).alias(
            "v"
        ),
    )
    per_part = ps.groupBy("ps_partkey").agg(
        F.sum("v").cast("long").alias("value_micros")
    )
    total = per_part.agg(
        F.sum("value_micros").cast("long").alias("total_micros")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_micros")
            > F.expr(f"total_micros div {fraction_den}")
        )
        .select("ps_partkey", "value_micros")
    )


def parts_supplier_counts(
    part: DataFrame,
    partsupp: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#17",
    excl_type_prefix: str = "PROMO",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) outside the excluded brand/type, minus "complaint" suppliers
    (the deterministic stand-in: s_name ending in '7' — the schema has
    no comment column).

    Scale shape: the complaint exclusion is a broadcast ANTI join
    before the count; part predicates push to its scan; the distinct
    count groups on low-cardinality keys (brand x type x 7 sizes)."""
    bad = supplier.where(F.col("s_name").endswith("7")).select(
        F.col("s_suppkey").alias("bad_key")
    )
    pts = part.where(
        (F.col("p_brand") != excl_brand)
        & (~F.col("p_type").startswith(excl_type_prefix))
        & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = partsupp.join(
        pts, F.col("ps_partkey") == F.col("p_partkey")
    ).join(
        F.broadcast(bad),
        F.col("ps_suppkey") == F.col("bad_key"),
        "left_anti",
    )
    return ps.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
    )


def potential_promotion_suppliers(
    part: DataFrame,
    partsupp: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding EXCESS stock of the named
    parts — ps_availqty > 2 * the pair's quantity shipped in the year
    (the nested correlated subqueries rewritten as one grouped join).

    Scale shape: the part-name filter broadcasts onto both partsupp
    and the fact scan; shipped quantity is one map-side-combined
    groupBy on the (partkey, suppkey) pair; the excess test is an
    exact integer compare; nation detail broadcasts at the end."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    pts = part.where(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .join(F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("qty")
        )
    )
    excess = (
        partsupp.join(
            F.broadcast(pts), F.col("ps_partkey") == F.col("p_partkey")
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > 2 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        excess.join(
            supplier, F.col("ps_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


def returnflag_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per lineitem category, how many HIGH-priority
    vs lower-priority orders shipped in the window — the conditional
    two-way count after the fact-dimension join.  The schema carries
    no shipmode/commitdate/receiptdate, so the category is
    l_returnflag and the window is on l_shipdate (same adaptation
    notes as priority_late_orders).

    Scale shape: the date predicate pushes to the fact scan; one hash
    equi-join on orderkey; map-side-combined conditional counts."""
    lo = F.lit(date_lo).cast("timestamp")
    hi = F.lit(date_hi).cast("timestamp")
    li = lineitem.where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).cast("long").alias("high_line_count"),
            F.sum((~high).cast("long"))
            .cast("long")
            .alias("low_line_count"),
        )
    )


def scd2_history(
    events: DataFrame,
    field: str = "k",
    bucket: int = 25,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, tier, valid_from_us, valid_to_us, version, is_current)
    — the Slowly-Changing-Dimension Type-2 build: treat the event
    stream as a change-log of a per-user attribute (``props.$k div
    bucket``, the "plan tier"), collapse consecutive repeats, and emit
    one VERSIONED row per change with half-open validity
    ``[valid_from, valid_to)`` (NULL valid_to + is_current on the open
    segment).  The warehouse-dimension op every star schema needs —
    dimension tables join fact rows by ``user_id`` + ``ts BETWEEN``
    (the as-of machinery next door in this module).

    Exactness: JVM-side JSON (``get_json_object``), BIGINT micros,
    integer tier; the change-collapse and versioning are two passes of
    the same (user, ts, event_id) window — fully deterministic
    including ties.

    Scale shape: one shuffle on the unit key; both windows ride it.
    Output is change-sized, not event-sized, by construction."""
    from pyspark.sql import Window

    us = events.select(
        F.col(unit_col).alias("user_id"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("ts_us"),
        "event_id",
        F.expr(
            f"cast(get_json_object(props, '$.{field}') as bigint)"
            f" div {int(bucket)}"
        ).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ch = (
        us.withColumn("pt", F.lag("tier").over(w))
        .where(F.col("pt").isNull() | (F.col("tier") != F.col("pt")))
        .drop("pt")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ch.select(
        "user_id",
        "tier",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("ts_us").over(w2).isNull().alias("is_current"),
    )
