"""Deterministic tiny domain-silver fixtures honoring FIXTURES.md §5
invariants: every child row's contract exists in LS_Opening; lease
lifecycle opened → repayments → at most one terminal close →
LS_Loan_Closing; snapshot rounds share timestamps; ~40% of leases open.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

BASE = datetime(2024, 1, 1)


def build_domain_tables(spark):
    n_leases = 20
    openings, repayments, closings, loan_closings, liqs = [], [], [], [], []
    for i in range(n_leases):
        cid = f"lease{i:03d}"
        addr = f"addr{i % 5}"
        t_open = BASE + timedelta(days=i)
        loan = Decimal(1_000_000 + i * 10_000)
        dp = Decimal(500_000)
        openings.append(
            (cid, addr, "ATOM" if i % 3 else "OSMO", 80 + i, t_open, f"pool{i % 2}",
             loan, loan * 10, dp, dp, f"tx{i}")
        )
        # two repayments each
        for j in range(2):
            t_r = t_open + timedelta(days=10 + j * 10)
            terminal = (j == 1) and (i % 5 < 3)  # 60% close via final repayment
            repayments.append(
                (1000 + i * 10 + j, j, cid, "USDC", Decimal(200_000),
                 Decimal(200_000), t_r, terminal, Decimal(150_000),
                 Decimal(10_000), Decimal(11_000), Decimal(12_000),
                 Decimal(13_000), f"txr{i}_{j}")
            )
            if terminal:
                t_c = t_r + timedelta(hours=1)
                closings.append((cid, t_c, f"txc{i}"))
                pnl = Decimal((i - 10) * 50_000)  # mix of wins and losses
                loan_closings.append(
                    (cid, loan, Decimal(400_000), pnl, t_c, "repay", True, 2000 + i)
                )
        if i % 10 == 9:  # one liquidation per 10 leases
            liqs.append(
                (3000 + i, 0, cid, "ATOM", Decimal(50_000), Decimal(50_000),
                 "USDC", Decimal(60_000), Decimal(60_000), t_open + timedelta(days=25),
                 False, "overdue", f"txl{i}")
            )

    t = {}
    t["LS_Opening"] = spark.createDataFrame(
        openings,
        "LS_contract_id string, LS_address_id string, LS_asset_symbol string, "
        "LS_interest int, LS_timestamp timestamp, LS_loan_pool_id string, "
        "LS_loan_amnt decimal(38,0), LS_loan_amnt_stable decimal(38,0), "
        "LS_cltr_amnt decimal(38,0), LS_cltr_amnt_stable decimal(38,0), Tx_Hash string",
    )
    t["LS_Repayment"] = spark.createDataFrame(
        repayments,
        "LS_repayment_height long, LS_repayment_idx int, LS_contract_id string, "
        "LS_payment_symbol string, LS_payment_amnt decimal(38,0), "
        "LS_payment_amnt_stable decimal(38,0), LS_timestamp timestamp, "
        "LS_loan_close boolean, LS_principal_stable decimal(38,0), "
        "LS_prev_margin_stable decimal(38,0), LS_prev_interest_stable decimal(38,0), "
        "LS_current_margin_stable decimal(38,0), LS_current_interest_stable decimal(38,0), "
        "Tx_Hash string",
    )
    t["LS_Closing"] = spark.createDataFrame(
        closings, "LS_contract_id string, LS_timestamp timestamp, Tx_Hash string"
    )
    t["LS_Loan_Closing"] = spark.createDataFrame(
        loan_closings,
        "LS_contract_id string, LS_amnt decimal(38,0), LS_amnt_stable decimal(38,0), "
        "LS_pnl decimal(38,0), LS_timestamp timestamp, Type string, Active boolean, Block long",
    )
    t["LS_Liquidation"] = spark.createDataFrame(
        liqs,
        "LS_liquidation_height long, LS_liquidation_idx int, LS_contract_id string, "
        "LS_amnt_symbol string, LS_amnt decimal(38,0), LS_amnt_stable decimal(38,0), "
        "LS_payment_symbol string, LS_payment_amnt decimal(38,0), "
        "LS_payment_amnt_stable decimal(38,0), LS_timestamp timestamp, "
        "LS_loan_close boolean, LS_transaction_type string, Tx_Hash string",
    )
    t["LS_Close_Position"] = spark.createDataFrame(
        [],
        "LS_position_height long, LS_position_idx int, LS_contract_id string, "
        "LS_payment_amnt_stable decimal(38,0), LS_timestamp timestamp, LS_loan_close boolean",
    )

    # two snapshot rounds; all open leases share each round's timestamp
    snap_rounds = [BASE + timedelta(days=40), BASE + timedelta(days=41)]
    closed_ids = {r[0] for r in loan_closings}
    ls_state = []
    for rts in snap_rounds:
        for i in range(n_leases):
            cid = f"lease{i:03d}"
            if cid in closed_ids:
                continue
            ls_state.append(
                (cid, rts, Decimal(1_400_000 + i * 1000), Decimal(900_000),
                 Decimal(1_000), Decimal(2_000), Decimal(3_000), Decimal(4_000))
            )
    t["LS_State"] = spark.createDataFrame(
        ls_state,
        "LS_contract_id string, LS_timestamp timestamp, LS_amnt_stable decimal(38,0), "
        "LS_principal_stable decimal(38,0), LS_prev_margin_stable decimal(38,0), "
        "LS_prev_interest_stable decimal(38,0), LS_current_margin_stable decimal(38,0), "
        "LS_current_interest_stable decimal(38,0)",
    )

    deposits, withdrawals, lender_state, pool_state = [], [], [], []
    for i in range(10):
        lender = f"lender{i % 4}"
        pool = f"pool{i % 2}"
        deposits.append(
            (5000 + i, 0, lender, BASE + timedelta(days=i), pool,
             Decimal(10_000), Decimal(10_000), Decimal(9_000), f"txd{i}")
        )
        if i % 3 == 0:
            withdrawals.append(
                (6000 + i, 0, lender, BASE + timedelta(days=i + 5), pool,
                 Decimal(4_000), Decimal(4_000), Decimal(3_600), False, f"txw{i}")
            )
    for rts in snap_rounds:
        for p in ("pool0", "pool1"):
            pool_state.append((p, rts, Decimal(60_000), Decimal(50_000), Decimal(45_000)))
        for l in ("lender0", "lender1", "lender2", "lender3"):
            lender_state.append((l, "pool0", rts, Decimal(5_000)))
    t["LP_Deposit"] = spark.createDataFrame(
        deposits,
        "LP_deposit_height long, LP_deposit_idx int, LP_address_id string, "
        "LP_timestamp timestamp, LP_Pool_id string, LP_amnt_stable decimal(38,0), "
        "LP_amnt_asset decimal(38,0), LP_amnt_receipts decimal(38,0), Tx_Hash string",
    )
    t["LP_Withdraw"] = spark.createDataFrame(
        withdrawals,
        "LP_withdraw_height long, LP_withdraw_idx int, LP_address_id string, "
        "LP_timestamp timestamp, LP_Pool_id string, LP_amnt_stable decimal(38,0), "
        "LP_amnt_asset decimal(38,0), LP_amnt_receipts decimal(38,0), "
        "LP_deposit_close boolean, Tx_Hash string",
    )
    t["LP_Pool_State"] = spark.createDataFrame(
        pool_state,
        "LP_Pool_id string, LP_Pool_timestamp timestamp, "
        "LP_Pool_total_value_locked_stable decimal(38,0), "
        "LP_Pool_total_borrowed_stable decimal(38,0), LP_Pool_total_issued_receipts decimal(38,0)",
    )
    t["LP_Lender_State"] = spark.createDataFrame(
        lender_state,
        "LP_address_id string, LP_Pool_id string, LP_timestamp timestamp, "
        "LP_Lender_receipts decimal(38,0)",
    )

    t["TR_Profit"] = spark.createDataFrame(
        [
            (7000 + i, 0, BASE + timedelta(days=i * 3), Decimal(1_000 * (i + 1)),
             Decimal(500 * (i + 1)), f"txp{i}")
            for i in range(8)
        ]
        + [(7100, 0, BASE + timedelta(days=30), Decimal(10**12), Decimal(1), "txbad")],  # outlier
        "TR_Profit_height long, TR_Profit_idx int, TR_Profit_timestamp timestamp, "
        "TR_Profit_amnt_stable decimal(38,0), TR_Profit_amnt_nls decimal(38,0), Tx_Hash string",
    )
    t["TR_Rewards_Distribution"] = spark.createDataFrame(
        [
            (8000 + i, 0, f"pool{i % 2}", BASE + timedelta(days=i * 4),
             Decimal(300 * (i + 1)), Decimal(150), 0, f"txrw{i}")
            for i in range(5)
        ],
        "TR_Rewards_height long, TR_Rewards_idx int, TR_Rewards_Pool_id string, "
        "TR_Rewards_timestamp timestamp, TR_Rewards_amnt_stable decimal(38,0), "
        "TR_Rewards_amnt_nls decimal(38,0), Event_Block_Index int, Tx_Hash string",
    )
    t["MP_Asset"] = spark.createDataFrame(
        [
            ("ATOM", BASE + timedelta(minutes=m), Decimal(10) + Decimal(m % 7) / 10, "p1")
            for m in range(0, 120, 5)
        ],
        "MP_asset_symbol string, MP_asset_timestamp timestamp, "
        "MP_price_in_stable decimal(38,18), Protocol string",
    )
    t["block"] = spark.createDataFrame([(i,) for i in range(1, 50)], "id long")
    t["raw_message"] = spark.createDataFrame(
        [
            (i, f"addr{i % 5}", "contract1", f"txm{i}", "MsgExecuteContract",
             "{}", 100 + i, Decimal(25), "unls", "", BASE + timedelta(hours=i),
             None, None if i % 4 else 5)
            for i in range(12)
        ],
        "index int, from string, to string, tx_hash string, type string, value string, "
        "block long, fee_amount decimal(38,0), fee_denom string, memo string, "
        "timestamp timestamp, rewards string, code int",
    )
    return add_registry_tables(spark, t)


def add_registry_tables(spark, t):
    """Dimension registries (FIXTURES.md §4)."""
    t["protocol_registry"] = spark.createDataFrame(
        [
            ("osmosis-usdc", "osmosis", "osmosis-dex", "pool0", "USDC", "Long", True),
            ("neutron-usdc", "neutron", "astroport", "pool1", "USDC", "Short", True),
            ("legacy", "osmosis", "osmosis-dex", "poolX", "USDC", "Long", False),
        ],
        "protocol_name string, network string, dex string, lpp_contract string, "
        "lpn_symbol string, position_type string, is_active boolean",
    )
    t["currency_registry"] = spark.createDataFrame(
        [
            ("ATOM", "ibc/atom", 6, "native", True),
            ("OSMO", "ibc/osmo", 6, "native", True),
            ("USDC", "ibc/usdc", 6, "stable", True),
            ("OLD", "ibc/old", 8, "native", False),
        ],
        "ticker string, bank_symbol string, decimal_digits int, currency_group string, is_active boolean",
    )
    # push subscriptions (V001:346-356; A24's dispatch half, round 10):
    # addr0 holds two active subs + one inactive, addr1 one active
    t["subscription"] = spark.createDataFrame(
        [
            ("addr0", "https://push.example/0", "p0", "s0", True),
            ("addr0", "https://push.example/1", "p1", "s1", True),
            ("addr0", "https://push.example/2", "p2", "s2", False),
            ("addr1", "https://push.example/3", "p3", "s3", True),
        ],
        "address string, endpoint string, p256dh string, auth string, active boolean",
    )
    return t
