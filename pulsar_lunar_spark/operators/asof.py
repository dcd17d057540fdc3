"""As-of join (nearest earlier event), Spark-first.

Semantics: for every left row, attach the payload of the latest right row
with the same key and ``right.ts <= left.ts`` (optionally within a
tolerance). This is the messaging-world "enrich each event with the most
recent state snapshot" operator (SURVEY §2B joins row).

Implementation is the union + carry-forward-window form, NOT a range join:
both sides are unioned, shuffled ONCE by key, sorted by (ts, side) inside
each partition, and a ``last(..., ignorenulls=True)`` running window carries
the right payload forward onto left rows. Cost at 100 TB: one shuffle of
|L|+|R| rows and one in-partition sort — same asymptotics as a sort-merge
join, with no O(|L|x|R|) candidate explosion a naive theta-join would have.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Return ``left`` with, per row, the latest earlier ``right`` payload
    (``direction="backward"``, default) or the earliest later one
    (``direction="forward"`` — right.ts >= left.ts: the "next state
    snapshot / next price tick" enrichment).

    Output columns: all of ``left``'s, plus ``{right_ts}{suffix}`` and
    ``{c}{suffix}`` for each payload column (null when no matching right
    row exists, or none within ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in keys and c != right_ts]

    left_cols = left.columns
    # Unified layout: keys, event ts, side marker, left payload, right payload.
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        # Right rows with ts == left ts sort first (side 0 < 1) => inclusive <=.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        # Forward: left rows sort BEFORE right rows at equal ts (side desc:
        # 1 before 0) => inclusive >=; take the FIRST right row at or after.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    carried = unioned.select(
        *unioned.columns,
        *[
            pick(F.col(f"__r_{c}")).over(w).alias(f"__c_{c}")
            for c in payload_cols
        ],
        pick(F.col("__r_ts")).over(w).alias("__c_ts"),
    )

    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = (
            F.unix_timestamp(F.col("__ts")) - F.unix_timestamp(F.col("__c_ts"))
            if direction == "backward"
            else F.unix_timestamp(F.col("__c_ts")) - F.unix_timestamp(F.col("__ts"))
        )
        in_tol = F.col("__c_ts").isNotNull() & (gap <= tolerance_seconds)
        sel_payload = [
            F.when(in_tol, F.col(f"__c_{c}")).otherwise(F.lit(None)).alias(f"{c}{suffix}")
            for c in payload_cols
        ]
        sel_ts = F.when(in_tol, F.col("__c_ts")).otherwise(F.lit(None)).alias(f"{right_ts}{suffix}")
    else:
        sel_payload = [F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in payload_cols]
        sel_ts = F.col("__c_ts").alias(f"{right_ts}{suffix}")

    return out.select(
        *[F.col(k) for k in keys],
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols if c not in keys and c != left_ts],
        sel_ts,
        *sel_payload,
    )
