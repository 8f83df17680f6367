"""Query-parameter time-window semantics (SURVEY.md §2.C).

Every list/series endpoint in the reference takes ``?period=3m|6m|12m|all``
(default 3m) and/or ``?from=<ts>`` and appends
``ts >= NOW() - INTERVAL 'n months'`` / ``ts > $from`` predicates
(`helpers/time_window.rs:79-99`, pattern `ls_opening.rs:1510-1528`).

``period_filter`` reproduces that contract. ``anchor`` defaults to the
current timestamp; the oracle-checked registry queries pin it to a
data-derived scalar (MAX of the ts column) so both engines evaluate the
same instant — NOW() can never hash-match across two processes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

PERIODS = {"3m": 3, "6m": 6, "12m": 12, "all": None}


def period_predicate(ts_col: Column, period: str, anchor: Column | None = None) -> Column:
    """Boolean predicate implementing ?period= (`time_window.rs:79-91`)."""
    months = PERIODS.get(period, 3)
    if months is None:
        return F.lit(True)
    anchor = anchor if anchor is not None else F.current_timestamp()
    return ts_col >= anchor - F.expr(f"INTERVAL {months} MONTHS")


def period_filter(
    df: DataFrame,
    ts_col: str,
    period: str = "3m",
    from_ts=None,
    anchor: Column | None = None,
) -> DataFrame:
    """Apply ?period= and ?from= exactly as the reference stacks them."""
    out = df.filter(period_predicate(F.col(ts_col), period, anchor))
    if from_ts is not None:
        out = out.filter(F.col(ts_col) > F.lit(from_ts).cast("timestamp"))
    return out
