"""Explicit StructType schemas for every domain table (no inference).

Derived from the reference's versioned migrations
(`migrations/V001__initial_schema.sql` + `V003`, `V008`, `V012`) — see
SURVEY.md §1. The reference fixes schemas via refinery migrations run at
startup (`crates/etl-core/src/migration.rs`); here they are code-versioned
StructTypes applied on read/write.

Decimal policy (SURVEY.md §1.3): the reference uses DECIMAL(39,0)/(42,0)
for raw integer on-chain amounts and DECIMAL(39,18) for prices; Spark
caps precision at 38, so amounts are DecimalType(38,0) and prices
DecimalType(38,18). This narrowing is safe for u128-bounded chain amounts
(< 1e38 in practice) and is applied uniformly at parse time.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AMOUNT = DecimalType(38, 0)  # reference DECIMAL(39,0) / (42,0)
PRICE = DecimalType(38, 18)  # reference DECIMAL(39,18)


def _f(name: str, typ, nullable: bool = True) -> StructField:
    return StructField(name, typ, nullable)


# Bronze: one row per chain event — block/tx coordinates + raw KV
# attributes (`event_parsing.rs:313-327` builds HashMap<String,String>).
BRONZE_EVENT = StructType(
    [
        _f("block", LongType(), False),
        _f("tx_hash", StringType(), False),
        _f("event_index", IntegerType(), False),
        _f("event_type", StringType(), False),
        _f("timestamp", TimestampType(), False),
        _f("attributes", MapType(StringType(), StringType()), False),
    ]
)

# `V001:25-31` — market price time series, PK (symbol, timestamp, protocol).
MP_ASSET = StructType(
    [
        _f("MP_asset_symbol", StringType(), False),
        _f("MP_asset_timestamp", TimestampType(), False),
        _f("MP_price_in_stable", PRICE, False),
        _f("Protocol", StringType(), False),
    ]
)

# `V001:97-114` + `V003:5-9` — lease opening, PK LS_contract_id.
LS_OPENING = StructType(
    [
        _f("LS_contract_id", StringType(), False),
        _f("LS_address_id", StringType(), False),
        _f("LS_asset_symbol", StringType(), False),
        _f("LS_interest", IntegerType(), False),  # permille*10: 85 => 8.5%
        _f("LS_timestamp", TimestampType(), False),
        _f("LS_loan_pool_id", StringType(), False),
        _f("LS_loan_amnt", AMOUNT, False),
        _f("LS_loan_amnt_stable", AMOUNT),
        _f("LS_loan_amnt_asset", AMOUNT),
        _f("LS_cltr_symbol", StringType(), False),
        _f("LS_cltr_amnt", AMOUNT, False),
        _f("LS_cltr_amnt_stable", AMOUNT),
        _f("LS_cltr_amnt_asset", AMOUNT),
        _f("LS_native_amnt_stable", AMOUNT),
        _f("LS_native_amnt_nolus", AMOUNT),
        _f("LS_lpn_loan_amnt", AMOUNT),
        _f("Tx_Hash", StringType()),
        _f("LS_position_type", StringType()),  # 'Long' | 'Short' (V012-era)
        _f("LS_lpn_symbol", StringType()),
        _f("LS_lpn_decimals", LongType()),
        _f("LS_opening_price", PRICE),  # V003 precomputed columns
        _f("LS_liquidation_price_at_open", PRICE),
    ]
)

# `V001:135-151` — repayment events, PK (height, idx).
LS_REPAYMENT = StructType(
    [
        _f("LS_repayment_height", LongType(), False),
        _f("LS_repayment_idx", IntegerType()),
        _f("LS_contract_id", StringType(), False),
        _f("LS_payment_symbol", StringType(), False),
        _f("LS_payment_amnt", AMOUNT, False),
        _f("LS_payment_amnt_stable", AMOUNT),
        _f("LS_timestamp", TimestampType(), False),
        _f("LS_loan_close", BooleanType(), False),
        _f("LS_prev_margin_stable", AMOUNT),
        _f("LS_prev_interest_stable", AMOUNT),
        _f("LS_current_margin_stable", AMOUNT),
        _f("LS_current_interest_stable", AMOUNT),
        _f("LS_principal_stable", AMOUNT),
        _f("Tx_Hash", StringType()),
    ]
)

# `V001:175-195` — market close events, PK (height, idx).
LS_CLOSE_POSITION = StructType(
    [
        _f("LS_position_height", LongType(), False),
        _f("LS_position_idx", IntegerType()),
        _f("LS_contract_id", StringType(), False),
        _f("LS_change", AMOUNT),
        _f("LS_amnt", AMOUNT),
        _f("LS_amnt_symbol", StringType()),
        _f("LS_amnt_stable", AMOUNT),
        _f("LS_payment_symbol", StringType()),
        _f("LS_payment_amnt", AMOUNT),
        _f("LS_payment_amnt_stable", AMOUNT),
        _f("LS_timestamp", TimestampType(), False),
        _f("LS_loan_close", BooleanType(), False),
        _f("LS_prev_margin_stable", AMOUNT),
        _f("LS_prev_interest_stable", AMOUNT),
        _f("LS_current_margin_stable", AMOUNT),
        _f("LS_current_interest_stable", AMOUNT),
        _f("LS_principal_stable", AMOUNT),
        _f("Tx_Hash", StringType()),
    ]
)

# `V001:153-173` (+V010 LS_liquidation_price) — liquidations.
LS_LIQUIDATION = StructType(
    [
        _f("LS_liquidation_height", LongType(), False),
        _f("LS_liquidation_idx", IntegerType()),
        _f("LS_contract_id", StringType(), False),
        _f("LS_amnt_symbol", StringType()),
        _f("LS_amnt", AMOUNT),
        _f("LS_amnt_stable", AMOUNT),
        _f("LS_payment_symbol", StringType()),
        _f("LS_payment_amnt", AMOUNT),
        _f("LS_payment_amnt_stable", AMOUNT),
        _f("LS_timestamp", TimestampType(), False),
        _f("LS_loan_close", BooleanType(), False),
        _f("LS_transaction_type", StringType()),
        _f("LS_prev_margin_stable", AMOUNT),
        _f("LS_prev_interest_stable", AMOUNT),
        _f("LS_current_margin_stable", AMOUNT),
        _f("LS_current_interest_stable", AMOUNT),
        _f("LS_principal_stable", AMOUNT),
        _f("Tx_Hash", StringType()),
        _f("LS_liquidation_price", PRICE),
    ]
)

# `V001:197-201` — terminal close marker, PK LS_contract_id.
LS_CLOSING = StructType(
    [
        _f("LS_contract_id", StringType(), False),
        _f("LS_timestamp", TimestampType(), False),
        _f("Tx_Hash", StringType()),
    ]
)

# `V001:223-233` — derived close record with PnL.
LS_LOAN_CLOSING = StructType(
    [
        _f("LS_contract_id", StringType(), False),
        _f("LS_amnt", AMOUNT),
        _f("LS_amnt_stable", AMOUNT),
        _f("LS_pnl", DecimalType(38, 0)),  # signed!
        _f("LS_timestamp", TimestampType(), False),
        _f("Type", StringType(), False),  # 'repay'|'market-close'|'liquidation'
        _f("Active", BooleanType(), False),
        _f("Block", LongType()),
    ]
)

# `V001:41-53` / `V001:81-94` — pool deposits/withdrawals, PK (height, idx).
LP_DEPOSIT = StructType(
    [
        _f("LP_deposit_height", LongType(), False),
        _f("LP_deposit_idx", IntegerType()),
        _f("LP_address_id", StringType(), False),
        _f("LP_timestamp", TimestampType(), False),
        _f("LP_Pool_id", StringType(), False),
        _f("LP_amnt_stable", AMOUNT),
        _f("LP_amnt_asset", AMOUNT),
        _f("LP_amnt_receipts", AMOUNT),
        _f("Tx_Hash", StringType()),
    ]
)

LP_WITHDRAW = StructType(
    [
        _f("LP_withdraw_height", LongType(), False),
        _f("LP_withdraw_idx", IntegerType()),
    ]
    + [
        _f("LP_address_id", StringType(), False),
        _f("LP_timestamp", TimestampType(), False),
        _f("LP_Pool_id", StringType(), False),
        _f("LP_amnt_stable", AMOUNT),
        _f("LP_amnt_asset", AMOUNT),
        _f("LP_amnt_receipts", AMOUNT),
        _f("LP_deposit_close", BooleanType(), False),
        _f("Tx_Hash", StringType()),
    ]
)

# `V001:254-262` / `V001:264-274` — treasury events.
TR_PROFIT = StructType(
    [
        _f("TR_Profit_height", LongType(), False),
        _f("TR_Profit_idx", IntegerType()),
        _f("TR_Profit_timestamp", TimestampType(), False),
        _f("TR_Profit_amnt_stable", AMOUNT),
        _f("TR_Profit_amnt_nls", AMOUNT),
        _f("Tx_Hash", StringType()),
    ]
)

TR_REWARDS_DISTRIBUTION = StructType(
    [
        _f("TR_Rewards_height", LongType(), False),
        _f("TR_Rewards_idx", IntegerType()),
        _f("TR_Rewards_Pool_id", StringType(), False),
        _f("TR_Rewards_timestamp", TimestampType(), False),
        _f("TR_Rewards_amnt_stable", AMOUNT),
        _f("TR_Rewards_amnt_nls", AMOUNT),
        _f("Event_Block_Index", IntegerType()),
        _f("Tx_Hash", StringType()),
    ]
)

# Dimensions (`V001:359-366`+V012, `V008:10-40`).
POOL_CONFIG = StructType(
    [
        _f("pool_id", StringType(), False),
        _f("position_type", StringType(), False),  # 'Long' | 'Short'
        _f("lpn_symbol", StringType(), False),
        # NOTE: stored as the power itself (e.g. 1000000), used as a
        # direct divisor by queries — `ls_opening.rs:385` divides by
        # lpn_decimals::numeric, not 10^lpn_decimals (FIXTURES.md §4).
        _f("lpn_decimals", LongType(), False),
        _f("label", StringType()),
        _f("protocol", StringType()),
        _f("is_active", BooleanType(), False),
        _f("stable_currency_symbol", StringType()),
        _f("stable_currency_decimals", LongType()),
    ]
)

CURRENCY_REGISTRY = StructType(
    [
        _f("ticker", StringType(), False),
        _f("bank_symbol", StringType()),
        # the EXPONENT (e.g. 6): queries use POWER(10, decimal_digits)
        _f("decimal_digits", IntegerType(), False),
        _f("currency_group", StringType()),
        _f("is_active", BooleanType(), False),
        _f("first_seen_at", TimestampType()),
        _f("deprecated_at", TimestampType()),
        _f("last_seen_protocol", StringType()),
    ]
)


# `V001:317-332` — every Cosmos tx message, semi-raw (bronze table; the
# protobuf decode itself is source-side, SURVEY §2.A A8).
RAW_MESSAGE = StructType(
    [
        _f("index", IntegerType(), False),
        _f("from", StringType()),
        _f("to", StringType()),
        _f("tx_hash", StringType(), False),
        _f("type", StringType()),
        _f("value", StringType()),
        _f("block", LongType(), False),
        _f("fee_amount", DecimalType(38, 0)),
        _f("fee_denom", StringType()),
        _f("memo", StringType()),
        _f("timestamp", TimestampType(), False),
        _f("rewards", StringType()),
        _f("code", IntegerType()),  # null = success
    ]
)
