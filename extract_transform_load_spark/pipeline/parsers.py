"""Event-type dispatch + attribute parsing (SURVEY.md §2.A A6/A7).

The reference routes 13 ``wasm-*`` event types to typed parsers
(`event_dispatch.rs:31-191`, enum `helpers/enums.rs:27-40`) that project
a ``HashMap<String,String>`` of KV attributes into typed structs
(`event_parsing.rs:16-327`). Spark-first: each parser is a
filter + select over the bronze event table — pure column expressions
that inline into whole-stage codegen, no UDFs.

Semantics preserved:

- **Interest-field aliasing** (`event_parsing.rs:195-237`): older events
  spell the interest quartet ``prev-margin-interest`` /
  ``prev-loan-interest`` / ``curr-margin-interest`` /
  ``curr-loan-interest``; newer ones ``overdue-margin-interest`` /
  ``overdue-loan-interest`` / ``due-margin-interest`` /
  ``due-loan-interest``. Parsers COALESCE both spellings.
- **Skip path** (`event_parsing.rs:84-111`): rows missing the ``height``
  attribute are dropped (the reference returns early).
- **Timestamp**: event attr ``at`` (RFC3339) when present, else the
  block timestamp.
- Amount columns cast to DecimalType(38,0), the engine decimal policy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..schemas import AMOUNT

EVENT_TYPES = (
    "wasm-ls-open",
    "wasm-ls-close",
    "wasm-ls-close-position",
    "wasm-ls-repay",
    "wasm-ls-liquidation",
    "wasm-ls-liquidation-warning",
    "wasm-ls-slippage-anomaly",
    "wasm-ls-auto-close-position",
    "wasm-reserve-cover-loss",
    "wasm-lp-deposit",
    "wasm-lp-withdraw",
    "wasm-tr-profit",
    "wasm-tr-rewards",
)


def _a(name: str) -> Column:
    return F.col("attributes").getItem(name)


def _amount(name: str) -> Column:
    return _a(name).cast(AMOUNT)


def _ts() -> Column:
    """Event time: `at` attribute if parseable, else block timestamp."""
    return F.coalesce(F.try_to_timestamp(_a("at")), F.col("timestamp"))


def _interest_quartet() -> list[Column]:
    """COALESCE of the two attribute spellings (`event_parsing.rs:195-237`)."""
    return [
        F.coalesce(_amount("prev-margin-interest"), _amount("overdue-margin-interest")).alias(
            "LS_prev_margin_stable"
        ),
        F.coalesce(_amount("prev-loan-interest"), _amount("overdue-loan-interest")).alias(
            "LS_prev_interest_stable"
        ),
        F.coalesce(_amount("curr-margin-interest"), _amount("due-margin-interest")).alias(
            "LS_current_margin_stable"
        ),
        F.coalesce(_amount("curr-loan-interest"), _amount("due-loan-interest")).alias(
            "LS_current_interest_stable"
        ),
    ]


def parse_ls_opening(bronze: DataFrame) -> DataFrame:
    """`wasm-ls-open` → LS_Opening core columns (`event_parsing.rs:25-43`).

    Enrichment columns (stable amounts, opening price, liquidation price)
    are added by pipeline.enrich — mirroring the reference's split between
    parser and handler (`handler/wasm_ls_open.rs`).
    """
    return bronze.filter(F.col("event_type") == "wasm-ls-open").select(
        _a("id").alias("LS_contract_id"),
        _a("customer").alias("LS_address_id"),
        _a("currency").alias("LS_asset_symbol"),
        _a("air").cast("int").alias("LS_interest"),
        _ts().alias("LS_timestamp"),
        _a("loan-pool-id").alias("LS_loan_pool_id"),
        _amount("loan-amount").alias("LS_loan_amnt"),
        _a("loan-symbol").alias("LS_lpn_symbol"),
        _amount("downpayment-amount").alias("LS_cltr_amnt"),
        _a("downpayment-symbol").alias("LS_cltr_symbol"),
        F.col("tx_hash").alias("Tx_Hash"),
        F.col("block").alias("Block"),
    )


def _payment_common(bronze: DataFrame, event_type: str) -> DataFrame:
    """Shared shape of repay/close-position/liquidation (`event_parsing.rs:84-237`)."""
    return bronze.filter(
        (F.col("event_type") == event_type) & _a("height").isNotNull()  # skip path
    ).select(
        _a("height").cast("long").alias("height"),
        F.col("event_index").alias("idx"),
        _a("to").alias("LS_contract_id"),
        _a("payment-symbol").alias("LS_payment_symbol"),
        _amount("payment-amount").alias("LS_payment_amnt"),
        _ts().alias("LS_timestamp"),
        F.coalesce(_a("loan-close").cast("boolean"), F.lit(False)).alias("LS_loan_close"),
        *_interest_quartet(),
        _amount("principal").alias("LS_principal_stable"),
        F.col("tx_hash").alias("Tx_Hash"),
        F.col("attributes"),
    )


def parse_ls_repayment(bronze: DataFrame) -> DataFrame:
    return (
        _payment_common(bronze, "wasm-ls-repay")
        .withColumnRenamed("height", "LS_repayment_height")
        .withColumnRenamed("idx", "LS_repayment_idx")
        .drop("attributes")
    )


def parse_ls_close_position(bronze: DataFrame) -> DataFrame:
    base = _payment_common(bronze, "wasm-ls-close-position")
    return (
        base.withColumn("LS_change", _amount("change"))
        .withColumn("LS_amnt", _amount("amount-amount"))
        .withColumn("LS_amnt_symbol", _a("amount-symbol"))
        .withColumnRenamed("height", "LS_position_height")
        .withColumnRenamed("idx", "LS_position_idx")
        .drop("attributes")
    )


def parse_ls_liquidation(bronze: DataFrame) -> DataFrame:
    base = _payment_common(bronze, "wasm-ls-liquidation")
    return (
        base.withColumn("LS_amnt", _amount("amount-amount"))
        .withColumn("LS_amnt_symbol", _a("amount-symbol"))
        .withColumn("LS_transaction_type", _a("cause"))
        .withColumnRenamed("height", "LS_liquidation_height")
        .withColumnRenamed("idx", "LS_liquidation_idx")
        .drop("attributes")
    )


def parse_ls_closing(bronze: DataFrame) -> DataFrame:
    """`wasm-ls-close` → terminal close marker (`V001:197-201`)."""
    return bronze.filter(F.col("event_type") == "wasm-ls-close").select(
        _a("id").alias("LS_contract_id"),
        _ts().alias("LS_timestamp"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def _lp_common(bronze: DataFrame, event_type: str, prefix: str) -> DataFrame:
    return bronze.filter(
        (F.col("event_type") == event_type) & _a("height").isNotNull()
    ).select(
        _a("height").cast("long").alias("height"),
        F.col("event_index").alias("idx"),
        _a("from").alias("LP_address_id"),
        _ts().alias("LP_timestamp"),
        _a("to").alias("LP_Pool_id"),
        _amount(f"{prefix}-amount").alias("LP_amnt_asset"),
        _a(f"{prefix}-symbol").alias("LP_symbol"),
        _amount("receipts").alias("LP_amnt_receipts"),
        F.col("tx_hash").alias("Tx_Hash"),
        F.col("attributes"),
    )


def parse_lp_deposit(bronze: DataFrame) -> DataFrame:
    """`wasm-lp-deposit` (`event_parsing.rs:239-255`)."""
    return (
        _lp_common(bronze, "wasm-lp-deposit", "deposit")
        .withColumnRenamed("height", "LP_deposit_height")
        .withColumnRenamed("idx", "LP_deposit_idx")
        .drop("attributes")
    )


def parse_lp_withdraw(bronze: DataFrame) -> DataFrame:
    """`wasm-lp-withdraw` (+`close` flag, `event_parsing.rs:257-274`)."""
    base = _lp_common(bronze, "wasm-lp-withdraw", "withdraw")
    return (
        base.withColumn(
            "LP_deposit_close", F.coalesce(_a("close").cast("boolean"), F.lit(False))
        )
        .withColumnRenamed("height", "LP_withdraw_height")
        .withColumnRenamed("idx", "LP_withdraw_idx")
        .drop("attributes")
    )


def parse_tr_profit(bronze: DataFrame) -> DataFrame:
    """`wasm-tr-profit` (`event_parsing.rs:276-289`)."""
    return bronze.filter(
        (F.col("event_type") == "wasm-tr-profit") & _a("height").isNotNull()
    ).select(
        _a("height").cast("long").alias("TR_Profit_height"),
        F.col("event_index").alias("TR_Profit_idx"),
        _ts().alias("TR_Profit_timestamp"),
        _a("profit-amount-symbol").alias("TR_Profit_symbol"),
        _amount("profit-amount-amount").alias("TR_Profit_amnt"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def parse_tr_rewards(bronze: DataFrame) -> DataFrame:
    """`wasm-tr-rewards` (`event_parsing.rs:291-311`)."""
    return bronze.filter(
        (F.col("event_type") == "wasm-tr-rewards") & _a("height").isNotNull()
    ).select(
        _a("height").cast("long").alias("TR_Rewards_height"),
        F.col("event_index").alias("TR_Rewards_idx"),
        _a("to").alias("TR_Rewards_Pool_id"),
        _ts().alias("TR_Rewards_timestamp"),
        _a("rewards-symbol").alias("TR_Rewards_symbol"),
        _amount("rewards-amount").alias("TR_Rewards_amnt"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def dispatch(bronze: DataFrame) -> dict[str, DataFrame]:
    """One-pass logical dispatch: event-type → parsed silver DataFrame.

    Catalyst shares the bronze scan across the returned plans when they
    are materialized together (e.g. with ``df.persist()`` on bronze for
    one batch). Mirrors `event_dispatch.rs:31-191`.
    """
    return {
        "LS_Opening": parse_ls_opening(bronze),
        "LS_Closing": parse_ls_closing(bronze),
        "LS_Repayment": parse_ls_repayment(bronze),
        "LS_Close_Position": parse_ls_close_position(bronze),
        "LS_Liquidation": parse_ls_liquidation(bronze),
        "LP_Deposit": parse_lp_deposit(bronze),
        "LP_Withdraw": parse_lp_withdraw(bronze),
        "TR_Profit": parse_tr_profit(bronze),
        "TR_Rewards_Distribution": parse_tr_rewards(bronze),
        "LS_Liquidation_Warning": parse_ls_liquidation_warning(bronze),
        "LS_Auto_Close_Position": parse_ls_auto_close_position(bronze),
        "LS_Slippage_Anomaly": parse_ls_slippage_anomaly(bronze),
        "Reserve_Cover_Loss": parse_reserve_cover_loss(bronze),
    }


def parse_ls_liquidation_warning(bronze: DataFrame) -> DataFrame:
    """`wasm-ls-liquidation-warning` → warning rows (`V001:212-221`)."""
    return bronze.filter(F.col("event_type") == "wasm-ls-liquidation-warning").select(
        _a("lease").alias("LS_contract_id"),
        _a("customer").alias("LS_address_id"),
        _a("lease-asset").alias("LS_asset_symbol"),
        _a("level").cast("int").alias("LS_level"),
        _amount("ltv").alias("LS_ltv"),
        _ts().alias("LS_timestamp"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def parse_ls_auto_close_position(bronze: DataFrame) -> DataFrame:
    """`wasm-ls-auto-close-position` → take-profit / stop-loss strategy
    rows (`V001:203-210`)."""
    return bronze.filter(F.col("event_type") == "wasm-ls-auto-close-position").select(
        _a("to").alias("LS_contract_id"),
        _a("strategy").alias("LS_Close_Strategy"),
        _amount("strategy-ltv").alias("LS_Close_Strategy_Ltv"),
        _ts().alias("LS_timestamp"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def parse_ls_slippage_anomaly(bronze: DataFrame) -> DataFrame:
    """`wasm-ls-slippage-anomaly` (`V001:243-251`)."""
    return bronze.filter(F.col("event_type") == "wasm-ls-slippage-anomaly").select(
        _a("customer").alias("LS_address_id"),
        _a("lease").alias("LS_contract_id"),
        _a("lease-asset").alias("LS_asset_symbol"),
        _amount("max-slippage").alias("LS_max_slipagge"),
        _ts().alias("LS_timestamp"),
        F.col("tx_hash").alias("Tx_Hash"),
    )


def parse_reserve_cover_loss(bronze: DataFrame) -> DataFrame:
    """`wasm-reserve-cover-loss` (`V001:335-343`)."""
    return bronze.filter(
        (F.col("event_type") == "wasm-reserve-cover-loss") & _a("height").isNotNull()
    ).select(
        _a("to").alias("LS_contract_id"),
        _a("height").cast("long").alias("LS_height"),
        F.col("event_index").alias("LS_idx"),
        _amount("payment-amount").alias("LS_payment_amnt"),
        _a("payment-symbol").alias("LS_payment_symbol"),
        _ts().alias("LS_timestamp"),
        F.col("tx_hash").alias("Tx_Hash"),
    )
