"""As-of (temporal) join — op J4, SURVEY §2.3.

Generalizes the reference's "apply today's rate to every order"
(reference: dags/order_currency_conversion_dag.py:33-42,105-110) into a
proper point-in-time lookup: each left row matches the single right row
with the greatest ``right_on <= left_on`` for its key.

Two physical strategies, chosen by the caller:

- :func:`asof_join_broadcast` — right side is small (a rates history is
  currencies × dates ≈ thousands of rows): broadcast non-equi join then
  keep the latest match per left row. No shuffle of the big side.
- :func:`asof_join_union` — both sides large: tag + union + a single
  shuffle on the key, then ``last_value(ignorenulls)`` over an ordered
  window carries each right value forward onto subsequent left rows.
  This is the 100 TB path: one shuffle, no row explosion (the broadcast
  variant briefly multiplies each left row by its matching rate rows
  before the rank filter; the union variant never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    left_key: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join with a broadcast right side.

    ``left_key`` must be unique per left row (used to pick the single
    closest match). Right columns other than ``by``/``right_on`` are
    appended; unmatched left rows keep them NULL.

    ``direction="backward"`` (default) matches the greatest
    ``right_on <= left_on``; ``"forward"`` the smallest
    ``right_on >= left_on`` (e.g. "next scheduled rate revision").
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r = right.withColumnRenamed(by, "__by")
    if direction == "backward":
        ineq = F.col(right_on) <= F.col(left_on)
        order = F.col(right_on).desc_nulls_last()
    else:
        ineq = F.col(right_on) >= F.col(left_on)
        order = F.col(right_on).asc_nulls_last()
    cond = (F.col(by) == F.col("__by")) & ineq
    joined = left.join(F.broadcast(r), cond, "left").drop("__by")
    w = Window.partitionBy(left_key).orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join_lookup(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join for a SMALL right side (r18 opt): the right
    history is folded into one sorted struct-array per key, broadcast,
    and probed per left row with a higher-order filter — the left side
    is never shuffled or sorted.

    Same contract as :func:`asof_join_union` (backward match: greatest
    ``right_on <= left_on``; unmatched left rows get NULL values), and
    proven row-identical against it in tests/test_asof_boundary.py.
    Where the union form keys a window on ``by`` — capping parallelism
    at the number of distinct keys and sorting every row — this form is
    a pure broadcast-join + per-row probe over a |history-per-key|
    array, the right plan whenever the right side fits in a broadcast
    (a rates history is currencies x dates). Keep the union form for
    genuinely large right sides.
    """
    hist = right.groupBy(by).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(right_on), *[F.col(c) for c in value_cols if c != right_on]))
        ).alias("__hist")
    )
    joined = left.join(F.broadcast(hist), by, "left")
    matched = F.filter(F.col("__hist"), lambda h: h[right_on] <= F.col(left_on))
    pick = F.get(matched, F.size(matched) - 1)
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[pick[c].alias(c) for c in value_cols],
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join via union + forward-fill window (scale path).

    One shuffle on ``by``; within each key, events are processed in
    time order with right rows sorted before left rows at equal
    timestamps (a rate effective AT t applies to an order AT t).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(by),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),  # left rows sort after right rows at equal __t
        *[F.col(c) for c in lcols if c != by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(by),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != by],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).select(
        F.col(by),
        F.col("__t").alias(left_on),
        *[F.col(c) for c in lcols if c not in (by, left_on)],
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )
    return out
