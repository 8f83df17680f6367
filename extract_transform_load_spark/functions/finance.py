"""Financial column math from the reference's query layer.

- ``apr_to_apy``: daily-compounding conversion
  ``(POWER(1 + apr/100/365, 365) - 1) * 100``
  (`ls_opening.rs:502,566`, `lp_pool_state.rs:514-517`).
- ``interest_rate``: the reference stores interest as permille·10
  smallints (85 ⇒ 8.5%) and divides by 10 at read (`ls_opening.rs:324`).
- ``decimal_shift``: ``amount / POWER(10, digits)`` — the currency
  decimal normalization used by the price poller
  (`handler/mp_assets.rs:16-206`; `POWER(10, d)` at `ls_opening.rs:693`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def apr_to_apy(apr_percent: Column) -> Column:
    return (F.pow(F.lit(1.0) + apr_percent / 100.0 / 365.0, F.lit(365.0)) - 1.0) * 100.0


def interest_rate(ls_interest: Column) -> Column:
    return ls_interest.cast("double") / 10.0


def decimal_shift(amount: Column, digits: Column) -> Column:
    return amount.cast("double") / F.pow(F.lit(10.0), digits.cast("double"))
