"""Ingest-time enrichment: as-of price joins + precomputed columns.

Mirrors the reference's design decision (migrations/V003 + SURVEY.md §4):
do the as-of price lookups ONCE at write time and persist the derived
columns (`LS_loan_amnt_stable`, `LS_opening_price`,
`LS_liquidation_price_at_open`), so the ~45 read queries never pay a
lateral join. The reference does per-event Postgres lookups
(`handler/wasm_ls_open.rs:63-97`, `configuration.rs:564-628`); here the
whole batch enriches in one distributed as-of join per (symbol) key —
O(batch) instead of O(events) round trips.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..operators.asof import as_of_join
from ..schemas import AMOUNT, PRICE


def attach_asof_price(
    df: DataFrame,
    prices: DataFrame,
    symbol_col: str,
    ts_col: str,
    out_col: str,
    price_symbol_col: str = "MP_asset_symbol",
    price_ts_col: str = "MP_asset_timestamp",
    price_col: str = "MP_price_in_stable",
) -> DataFrame:
    """Latest price with price_ts <= event ts for the row's symbol.

    One shuffle on symbol (union-sort as-of join, operators/asof.py). The
    reference's per-row `LEFT JOIN LATERAL ... LIMIT 1`
    (`dao/postgre/mp_asset.rs:125-187`) is the Postgres formulation of
    the same semantics.
    """
    p = prices.select(
        F.col(price_symbol_col).alias(symbol_col),
        F.col(price_ts_col).alias("__price_ts"),
        F.col(price_col).alias("__price"),
    )
    joined = as_of_join(
        df,
        p,
        on=[symbol_col],
        left_ts=ts_col,
        right_ts="__price_ts",
        value_cols=["__price"],
        suffix="",
    )
    return joined.withColumnRenamed("__price", out_col)


def in_stable(amount: Column, price: Column) -> Column:
    """amount × as-of price → stable units (`configuration.rs:564-628`).

    The raw multiply of decimal(38,0) × decimal(38,18) lands on
    decimal(38,6) under Spark's precision-loss rules — integer capacity
    ~1e32, covering any real token amount (the earlier cast of the
    amount to decimal(38,18) overflowed to NULL at 1e20, i.e. 100
    tokens of an 18-decimals asset). Result truncated to AMOUNT
    (decimal(38,0)) matching the reference's integer stable columns.
    """
    return (amount * price).cast(AMOUNT)


def enrich_ls_opening(opening: DataFrame, prices: DataFrame) -> DataFrame:
    """LS_Opening enrichment (`handler/wasm_ls_open.rs:51-187`).

    Three as-of price lookups — the reference's f1/f2/f5 fetch the
    loan-symbol (LPN), downpayment-symbol, and lease-currency prices
    (f4's pool-LPN price equals f1's: the loan symbol IS the pool LPN):

    - ``LS_loan_amnt_stable``  = loan × LOAN-SYMBOL price — the loan
      attribute is LPN-denominated (`parse_and_insert` prices
      ``item.loan_symbol``, not the lease currency)
    - ``LS_cltr_amnt_stable``  = downpayment × collateral price
    - ``LS_opening_price``     = lease-currency (asset) price at open
    - ``LS_lpn_loan_amnt``     — the position expressed in LPN units.
      The reference computes it from the gRPC lease state's position
      amount × asset price / LPN price; lease state is source-side
      extraction (SURVEY §2.A A3, out of engine scope), so the engine's
      stand-in is the loan leg: loan_stable / lpn_price.
    - ``LS_liquidation_price_at_open`` over STABLE amounts
      (`calculate_liquidation_price` takes down_payment_stable /
      loan_stable — raw amounts would mix denominations):
        Long:  (loan_stable/0.9) / (dp_stable + loan_stable) × asset_price
        Short: (dp_stable + loan_stable) / (lpn_loan_amnt/0.9)
    Position type defaults to Long when absent (V012-era rows).
    """
    df = attach_asof_price(
        opening, prices, symbol_col="LS_asset_symbol", ts_col="LS_timestamp", out_col="__asset_price"
    )
    df = attach_asof_price(
        df, prices, symbol_col="LS_cltr_symbol", ts_col="LS_timestamp", out_col="__cltr_price"
    )
    df = attach_asof_price(
        df, prices, symbol_col="LS_lpn_symbol", ts_col="LS_timestamp", out_col="__lpn_price"
    )

    asset_price = F.col("__asset_price")
    loan_stable_c = in_stable(F.col("LS_loan_amnt"), F.col("__lpn_price"))
    cltr_stable_c = in_stable(F.col("LS_cltr_amnt"), F.col("__cltr_price"))

    # Ratio math in double: Spark decimal division reduces result scale
    # to 6 under precision-loss rules, far coarser than float64 for
    # price-sized magnitudes.
    loan_s = F.col("LS_loan_amnt_stable").cast("double")
    dp_s = F.col("LS_cltr_amnt_stable").cast("double")
    lpn_loan = F.col("LS_lpn_loan_amnt").cast("double")
    pos_col = (
        F.col("LS_position_type")
        if "LS_position_type" in df.columns
        else F.lit(None).cast("string")
    )
    position = F.coalesce(pos_col, F.lit("Long"))

    liq_long = (
        (loan_s / 0.9) / F.nullif(dp_s + loan_s, F.lit(0.0)) * asset_price.cast("double")
    )
    liq_short = (dp_s + loan_s) / F.nullif(lpn_loan / 0.9, F.lit(0.0))

    return (
        df.withColumn("LS_loan_amnt_stable", loan_stable_c)
        .withColumn("LS_cltr_amnt_stable", cltr_stable_c)
        .withColumn("LS_opening_price", asset_price.cast(PRICE))
        .withColumn(
            "LS_lpn_loan_amnt",
            (
                F.col("LS_loan_amnt_stable").cast("decimal(38,6)")
                / F.nullif(F.col("__lpn_price"), F.lit(0).cast(PRICE))
            ).cast(AMOUNT),
        )
        .withColumn(
            "LS_liquidation_price_at_open",
            F.when(position == "Short", liq_short).otherwise(liq_long).cast(PRICE),
        )
        .drop("__asset_price", "__cltr_price", "__lpn_price")
    )
