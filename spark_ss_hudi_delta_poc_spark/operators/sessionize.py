"""Sessionization — batch gaps-and-islands over event streams.

Plan: one shuffle on user_id (window partition), two linear window passes
(lag → running sum), one partial-aggregated groupBy — the canonical
at-scale sessionization.  Timestamp math uses exact integer microseconds
(unix_micros / epoch_us) so the oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_MINUTES = 30


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = GAP_MINUTES,
) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events):
    a new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``."""
    gap_us = gap_minutes * 60 * 1_000_000
    order = [F.col(ts_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    wsum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    with_session = df.select(
        F.col(user_col), F.col(ts_col), F.sum(is_new).over(wsum).alias("session_idx")
    )
    return with_session.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = GAP_MINUTES,
) -> str:
    """DuckDB SQL computing the identical sessionization."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
    WITH flagged AS (
      SELECT {user_col}, {ts_col},
             CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                       OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM {table}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col} ASC)
    ),
    numbered AS (
      SELECT {user_col}, {ts_col},
             CAST(SUM(is_new) OVER (PARTITION BY {user_col} ORDER BY {ts_col} ASC
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT {user_col}, session_idx,
           MIN({ts_col}) AS session_start,
           MAX({ts_col}) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY {user_col}, session_idx
    """
