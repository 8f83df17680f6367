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

    Result truncated to AMOUNT (decimal(38,0)) matching the reference's
    integer stable-amount columns.
    """
    return (amount.cast(PRICE) * price).cast(AMOUNT)


def enrich_ls_opening(opening: DataFrame, prices: DataFrame) -> DataFrame:
    """LS_Opening enrichment (`handler/wasm_ls_open.rs:20-187`).

    Adds, from two as-of price lookups (asset + collateral symbol):

    - ``LS_loan_amnt_stable``  = loan × LPN price
    - ``LS_cltr_amnt_stable``  = downpayment × collateral price
    - ``LS_opening_price``     = asset price at open
    - ``LS_liquidation_price_at_open``:
        Long:  (loan/0.9) / (downpayment + loan) × asset_price
               (`wasm_ls_open.rs:112-151`)
        Short: (downpayment + loan) / (position_lpn/0.9)
    Position type defaults to Long when absent (V012-era rows).
    """
    df = attach_asof_price(
        opening, prices, symbol_col="LS_asset_symbol", ts_col="LS_timestamp", out_col="__asset_price"
    )
    df = (
        df.withColumnRenamed("LS_asset_symbol", "__tmp_sym")
        .withColumnRenamed("LS_cltr_symbol", "LS_asset_symbol")
    )
    df = attach_asof_price(
        df, prices, symbol_col="LS_asset_symbol", ts_col="LS_timestamp", out_col="__cltr_price"
    )
    df = (
        df.withColumnRenamed("LS_asset_symbol", "LS_cltr_symbol")
        .withColumnRenamed("__tmp_sym", "LS_asset_symbol")
    )

    # Ratio math in double: Spark decimal division reduces result scale
    # to 6 under precision-loss rules (38,18)/(38,18) → (38,6), which is
    # far coarser than float64 for price-sized magnitudes.
    loan = F.col("LS_loan_amnt").cast("double")
    dp = F.col("LS_cltr_amnt").cast("double")
    pos_col = (
        F.col("LS_position_type")
        if "LS_position_type" in df.columns
        else F.lit(None).cast("string")
    )
    position = F.coalesce(pos_col, F.lit("Long"))
    asset_price = F.col("__asset_price")

    liq_long = (loan / 0.9) / F.nullif(dp + loan, F.lit(0.0)) * asset_price.cast("double")
    liq_short = (dp + loan) / F.nullif(loan / 0.9, F.lit(0.0))

    return (
        df.withColumn("LS_loan_amnt_stable", in_stable(F.col("LS_loan_amnt"), asset_price))
        .withColumn("LS_cltr_amnt_stable", in_stable(F.col("LS_cltr_amnt"), F.col("__cltr_price")))
        .withColumn("LS_opening_price", asset_price.cast(PRICE))
        .withColumn(
            "LS_liquidation_price_at_open",
            F.when(position == "Short", liq_short).otherwise(liq_long).cast(PRICE),
        )
        .drop("__asset_price", "__cltr_price")
    )
