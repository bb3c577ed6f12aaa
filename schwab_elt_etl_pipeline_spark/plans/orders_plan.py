"""Order documents → normalized graph → vertical TRANSACTIONS (SURVEY §3.3).

Re-expresses the reference's two layers:

1. Python-side recursive flatten into ORDERS / ORDERLEGS / ORDERACTIVITIES /
   EXECUTIONLEGS with per-row dup guards (tools/db.py:707-1084) — here a
   bounded-depth ``childOrderStrategies`` unroll (F18) + ``posexplode`` of the
   nested arrays, with batch-level ``dropDuplicates`` on the natural keys (J9).
2. ``PYTHON.SP_PY_PARSE_TRANSACTIONS`` (sql/opt.sql:282-332): 3-table join
   (J1/J2), leg-level signed aggregation (A3-A6: SUM quantity, AVG of
   sign-flipped price, MAX-as-pivot short/long symbol fill), re-aggregation,
   and the FILLED/non-OCO filter (P7), left-joined back onto orders (J10).

Activity ids: the reference round-trips an IDENTITY value per insert
(tools/db.py:958-962); here ``activityId = xxhash64(orderId, activity pos)``
— deterministic, distributed, no serial point of contention at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.functions.scalars import signed_price
from schwab_elt_etl_pipeline_spark.functions.timeutils import parse_multi_format_ts
from schwab_elt_etl_pipeline_spark.operators.merge import surrogate_key

CHILD_DEPTH = 3  # bounded recursion of childOrderStrategies (FIXTURES §4)


def flatten_child_orders(orders: DataFrame, depth: int = CHILD_DEPTH) -> DataFrame:
    """F18: unroll ``childOrderStrategies`` to ``depth`` levels, threading
    ``parentOrderId`` (tools/db.py:1030-1084). Children beyond ``depth`` are
    absent from the fixture contract by construction."""
    out = orders.withColumn("parentOrderId", F.lit(None).cast("string"))
    frontier = out
    for _ in range(depth):
        if "childOrderStrategies" not in frontier.columns:
            break
        children = (
            frontier.filter(F.size(F.col("childOrderStrategies")) > 0)
            .select(
                F.col("orderId").alias("parentOrderId"),
                F.explode("childOrderStrategies").alias("child"),
            )
            .select("parentOrderId", "child.*")
        )
        if "childOrderStrategies" not in children.columns:
            children = children.withColumn(
                "childOrderStrategies", F.array().cast("array<struct<orderId:string>>")
            )
        children = children.select(*[c for c in frontier.columns if c != "parentOrderId"], "parentOrderId")
        out = out.unionByName(children, allowMissingColumns=True)
        frontier = children
    return out.drop("childOrderStrategies")


def normalize_order_graph(
    orders: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Explode the nested document into the four flat tables
    (sql/opt.sql:62-170), deduped on their natural keys (J9)."""
    flat = flatten_child_orders(orders)

    orders_tbl = flat.select(
        "orderId",
        "parentOrderId",
        "session",
        "duration",
        "orderType",
        "complexOrderStrategyType",
        "quantity",
        "filledQuantity",
        "remainingQuantity",
        "orderStrategyType",
        "status",
        parse_multi_format_ts("enteredTime").cast("timestamp_ntz").alias("enteredTime"),
        parse_multi_format_ts("closeTime").cast("timestamp_ntz").alias("closeTime"),
        "accountNumber",
    ).dropDuplicates(["orderId"])

    legs = (
        flat.select("orderId", F.explode("orderLegCollection").alias("leg"))
        .select(
            "orderId",
            F.col("leg.legId").alias("legId"),
            F.col("leg.orderLegType").alias("orderLegType"),
            F.col("leg.instruction").alias("instruction"),
            F.col("leg.positionEffect").alias("positionEffect"),
            F.col("leg.quantity").alias("quantity"),
            F.col("leg.instrument.symbol").alias("symbol"),
            F.col("leg.instrument.putCall").alias("putCall"),
            F.col("leg.instrument.underlyingSymbol").alias("underlyingSymbol"),
        )
        .dropDuplicates(["legId", "orderId"])
    )

    activities = (
        flat.select(
            "orderId", F.posexplode("orderActivityCollection").alias("pos", "act")
        )
        .select(
            surrogate_key(F.col("orderId"), F.col("pos")).alias("activityId"),
            "orderId",
            F.col("act.activityType").alias("activityType"),
            F.col("act.executionType").alias("executionType"),
            F.col("act.quantity").alias("quantity"),
            F.col("act.orderRemainingQuantity").alias("orderRemainingQuantity"),
            F.col("act.executionLegs").alias("executionLegs"),
        )
        .dropDuplicates(["activityId"])
    )

    exec_legs = (
        activities.select(
            "activityId", "orderId", F.explode("executionLegs").alias("xl")
        )
        .select(
            "activityId",
            "orderId",
            F.col("xl.legId").alias("legId"),
            F.col("xl.quantity").alias("quantity"),
            F.col("xl.mismarkedQuantity").alias("mismarkedQuantity"),
            F.col("xl.price").alias("price"),
            parse_multi_format_ts(F.col("xl.time")).cast("timestamp_ntz").alias("time"),
        )
        .dropDuplicates(["activityId", "legId"])
    )

    return orders_tbl, legs, activities.drop("executionLegs"), exec_legs


def build_transactions(
    orders_tbl: DataFrame,
    legs: DataFrame,
    activities: DataFrame,
    exec_legs: DataFrame,
) -> DataFrame:
    """SP_PY_PARSE_TRANSACTIONS (sql/opt.sql:282-332).

    Inner level groups execution fills per (orderId, instruction-prefix,
    positionEffect, symbol, putCall): AQ = SUM(quantity), P = AVG of the
    sign-flipped price (BUY → −price, A4), SS/LS = MAX-when pivot of the
    short/long symbol (A5). Outer level re-aggregates per order (A6), then
    filters FILLED / AWAITING_STOP_CONDITION and excludes OCO strategies (P7)
    and enriches back onto ORDERS (J10).
    """
    # Disambiguated projections: AQ sums the EXECUTION-leg quantity
    # (``SUM(C.quantity)`` with C = ExecutionLegs, sql/opt.sql:293-304).
    acts_p = activities.select("activityId", "orderId")
    xlegs_p = exec_legs.select(
        "activityId", "orderId", "legId",
        F.col("quantity").alias("fill_quantity"), "price",
    )
    legs_p = legs.select(
        "orderId", "legId", "instruction", "positionEffect", "symbol", "putCall"
    )
    fills = acts_p.join(xlegs_p, on=["activityId", "orderId"], how="left").join(
        legs_p, on=["orderId", "legId"], how="left"
    )  # J1/J2 3-table join

    inner = (
        fills.groupBy(
            "orderId",
            F.substring("instruction", 1, 3).alias("side"),
            "positionEffect",
            "symbol",
            "putCall",
        )
        .agg(
            F.sum("fill_quantity").alias("AQ"),
            F.avg(signed_price(F.col("instruction"), F.col("price"))).alias("P"),
            F.max(
                F.when(F.substring("instruction", 1, 3) != "BUY", F.col("symbol"))
            ).alias("SS"),
            F.max(
                F.when(F.substring("instruction", 1, 3) == "BUY", F.col("symbol"))
            ).alias("LS"),
        )
    )
    subs = inner.groupBy("orderId", "putCall", "positionEffect").agg(
        F.max("AQ").alias("AQ"),
        F.sum("P").alias("P"),
        F.max("SS").alias("SS"),
        F.max("LS").alias("LS"),
    )

    return (
        orders_tbl.filter(
            (F.col("orderStrategyType") != "OCO")
            & F.col("status").isin("FILLED", "AWAITING_STOP_CONDITION")
        )
        .join(subs, on="orderId", how="left")
        .select(
            "orderType",
            F.col("complexOrderStrategyType").alias("V"),
            "orderId",
            "status",
            "enteredTime",
            "closeTime",
            "accountNumber",
            "AQ",
            "P",
            "SS",
            "LS",
            "putCall",
            F.col("positionEffect").alias("PositionEffect"),
        )
    )
