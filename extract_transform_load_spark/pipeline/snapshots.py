"""State snapshots — the reference's hourly aggregation task
(SURVEY.md §2.A A12–A17).

The reference walks active entities and queries *live contract state*
over gRPC per lease/pool (`handler/ls_state.rs:16-127`,
`lp_pool_state.rs:13-110`), bounded by ``max_tasks``. A scan engine
reconstructs the same state from the event log instead — cumulative
aggregation per contract up to the snapshot timestamp — so a snapshot is
one deterministic batch, re-runnable for any historical timestamp
(the reference can only snapshot "now").

All snapshots for one round share a single ``agg_timestamp`` — queries
key on ``MAX(LS_timestamp)`` to find the latest round
(`ls_state.rs:200-221`), and FIXTURES.md §3 preserves that invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..schemas import AMOUNT


def active_leases(
    opening: DataFrame,
    repayments: DataFrame,
    close_positions: DataFrame,
    liquidations: DataFrame,
    closings: DataFrame,
) -> DataFrame:
    """Open leases = openings anti-joined against every close source
    (SURVEY.md §2.B B1; `ls_state.rs:72-126` uses 4 NOT EXISTS clauses —
    "short-circuit, better with indexes"; Spark's left_anti is the same
    plan shape, and Catalyst pushes the contract-id projection down).
    """
    closed_ids = (
        repayments.filter(F.col("LS_loan_close")).select("LS_contract_id")
        .unionByName(close_positions.filter(F.col("LS_loan_close")).select("LS_contract_id"))
        .unionByName(liquidations.filter(F.col("LS_loan_close")).select("LS_contract_id"))
        .unionByName(closings.select("LS_contract_id"))
        .distinct()
    )
    return opening.join(closed_ids, "LS_contract_id", "left_anti")


def _cum_before(df: DataFrame, ts: Column, amount_col: str, alias: str) -> DataFrame:
    """SUM(amount) per contract over events at-or-before the snapshot ts."""
    return (
        df.filter(F.col("LS_timestamp") <= ts)
        .groupBy("LS_contract_id")
        .agg(F.sum(F.col(amount_col)).cast(AMOUNT).alias(alias))
    )


def ls_state_snapshot(
    opening: DataFrame,
    repayments: DataFrame,
    close_positions: DataFrame,
    liquidations: DataFrame,
    closings: DataFrame,
    agg_timestamp,
) -> DataFrame:
    """Reconstruct LS_State rows for every lease open at ``agg_timestamp``.

    Principal outstanding = loan − Σ principal repaid; amount =
    opening amount − Σ closed/liquidated amounts (`V001:116-133`
    columns; reconstruction replaces the reference's per-lease gRPC
    state fetch in `handler/ls_state.rs`).
    """
    ts = F.lit(agg_timestamp).cast("timestamp")
    opened = opening.filter(F.col("LS_timestamp") <= ts)
    act = active_leases(
        opened,
        repayments.filter(F.col("LS_timestamp") <= ts),
        close_positions.filter(F.col("LS_timestamp") <= ts),
        liquidations.filter(F.col("LS_timestamp") <= ts),
        closings.filter(F.col("LS_timestamp") <= ts),
    )
    repaid = _cum_before(repayments, ts, "LS_principal_stable", "principal_repaid")
    closed_amt = _cum_before(close_positions, ts, "LS_payment_amnt_stable", "amnt_closed")
    liq_amt = _cum_before(liquidations, ts, "LS_payment_amnt_stable", "amnt_liquidated")

    z = F.lit(0).cast(AMOUNT)
    out = (
        act.join(repaid, "LS_contract_id", "left")
        .join(closed_amt, "LS_contract_id", "left")
        .join(liq_amt, "LS_contract_id", "left")
    )
    principal = (
        F.coalesce(F.col("LS_loan_amnt_stable"), z)
        - F.coalesce(F.col("principal_repaid"), z)
    )
    amnt = (
        F.coalesce(F.col("LS_loan_amnt_stable"), z)
        + F.coalesce(F.col("LS_cltr_amnt_stable"), z)
        - F.coalesce(F.col("amnt_closed"), z)
        - F.coalesce(F.col("amnt_liquidated"), z)
    )
    return out.select(
        "LS_contract_id",
        ts.alias("LS_timestamp"),
        F.greatest(amnt, z).cast(AMOUNT).alias("LS_amnt_stable"),
        F.greatest(principal, z).cast(AMOUNT).alias("LS_principal_stable"),
        F.coalesce(F.col("principal_repaid"), z).alias("LS_repaid_stable"),
    )


def lp_pool_state_snapshot(
    deposits: DataFrame, withdrawals: DataFrame, agg_timestamp
) -> DataFrame:
    """TVL per pool at ``agg_timestamp`` = Σ deposits − Σ withdrawals
    (`handler/lp_pool_state.rs:13-110`; the reference reads live pool
    balance + loan principal/interest over gRPC — the event-log
    reconstruction is the deposits/withdrawals ledger)."""
    ts = F.lit(agg_timestamp).cast("timestamp")
    d = (
        deposits.filter(F.col("LP_timestamp") <= ts)
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LP_amnt_asset").cast(AMOUNT).alias("deposited"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("receipts_minted"),
        )
    )
    w = (
        withdrawals.filter(F.col("LP_timestamp") <= ts)
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LP_amnt_asset").cast(AMOUNT).alias("withdrawn"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("receipts_burned"),
        )
    )
    z = F.lit(0).cast(AMOUNT)
    return (
        d.join(w, "LP_Pool_id", "full_outer")
        .select(
            "LP_Pool_id",
            ts.alias("LP_Pool_timestamp"),
            (F.coalesce(F.col("deposited"), z) - F.coalesce(F.col("withdrawn"), z))
            .cast(AMOUNT)
            .alias("LP_Pool_total_value_locked_asset"),
            (F.coalesce(F.col("receipts_minted"), z) - F.coalesce(F.col("receipts_burned"), z))
            .cast(AMOUNT)
            .alias("LP_Pool_total_issued_receipts"),
        )
    )


def lp_lender_state_snapshot(
    deposits: DataFrame, withdrawals: DataFrame, agg_timestamp
) -> DataFrame:
    """Per-(lender, pool) net position at ``agg_timestamp``
    (`handler/lp_lender_state.rs:13-114`)."""
    ts = F.lit(agg_timestamp).cast("timestamp")
    keys = ["LP_address_id", "LP_Pool_id"]
    d = (
        deposits.filter(F.col("LP_timestamp") <= ts)
        .groupBy(*keys)
        .agg(F.sum("LP_amnt_receipts").cast(AMOUNT).alias("minted"))
    )
    w = (
        withdrawals.filter(F.col("LP_timestamp") <= ts)
        .groupBy(*keys)
        .agg(F.sum("LP_amnt_receipts").cast(AMOUNT).alias("burned"))
    )
    z = F.lit(0).cast(AMOUNT)
    return (
        d.join(w, keys, "full_outer")
        .select(
            *keys,
            ts.alias("LP_timestamp"),
            (F.coalesce(F.col("minted"), z) - F.coalesce(F.col("burned"), z))
            .cast(AMOUNT)
            .alias("LP_Lender_receipts"),
        )
        .filter(F.col("LP_Lender_receipts") > 0)
    )


def tr_state_snapshot(tr_profit: DataFrame, agg_timestamp) -> DataFrame:
    """TR_State at ``agg_timestamp``: cumulative treasury profit
    (`handler/tr_state.rs:13-58` reads the live bank balance over gRPC;
    the event-log reconstruction is the profit ledger's running sum —
    one scalar aggregate, outlier rule applied as in the reference's
    profit queries). A NULL stable amount also drops the row — matching
    Postgres semantics of the reference's WHERE
    ``TR_Profit_amnt_stable < 1e10`` (`tr_profit.rs:221`), where
    NULL < x filters the row; the row's nls leg drops with it by
    design, not by accident."""
    ts = F.lit(agg_timestamp).cast("timestamp")
    return tr_profit.filter(
        (F.col("TR_Profit_timestamp") <= ts)
        & (F.col("TR_Profit_amnt_stable") < F.lit(10) ** 10)
    ).agg(
        ts.alias("TR_timestamp"),
        F.coalesce(F.sum("TR_Profit_amnt_stable"), F.lit(0)).cast(AMOUNT).alias(
            "TR_amnt_stable"
        ),
        F.coalesce(F.sum("TR_Profit_amnt_nls"), F.lit(0)).cast(AMOUNT).alias(
            "TR_amnt_nls"
        ),
    )


def _window(df: DataFrame, ts_col: str, lo: Column, hi: Column) -> DataFrame:
    return df.filter((F.col(ts_col) > lo) & (F.col(ts_col) <= hi))


def ls_state_incremental(
    prev_state: DataFrame,
    opening: DataFrame,
    repayments: DataFrame,
    close_positions: DataFrame,
    liquidations: DataFrame,
    closings: DataFrame,
    prev_ts,
    agg_timestamp,
) -> DataFrame:
    """Roll an LS_State snapshot forward using only (prev_ts, ts] events.

    The full reconstruction (:func:`ls_state_snapshot`) re-aggregates the
    entire event log every round — correct, but at 100 TB the log scan
    dwarfs the state: an hourly round re-reads years of history to move
    one hour. The state is additive per contract, so the snapshot rolls
    forward instead: cost is O(|delta| + |open set|) — the delta scan
    partition-prunes to one hour of a time-partitioned event table and
    the open set is the (small) previous snapshot.

    Transitions, matching the full reconstruction exactly:
    - opened in delta  -> seeded from the opening row (+ delta events);
    - closed in delta  -> dropped from the active set (any close source);
    - otherwise        -> amounts shifted by the delta sums.

    Requires the lifecycle invariant the domain guarantees (repayment
    never exceeds outstanding principal — the loan closes at zero), since
    the full path's ``greatest(·, 0)`` clamp is not additive through an
    overpayment. Equivalence to the full reconstruction is tested.
    """
    lo = F.lit(prev_ts).cast("timestamp")
    hi = F.lit(agg_timestamp).cast("timestamp")
    z = F.lit(0).cast(AMOUNT)

    d_rep = _window(repayments, "LS_timestamp", lo, hi)
    d_cp = _window(close_positions, "LS_timestamp", lo, hi)
    d_liq = _window(liquidations, "LS_timestamp", lo, hi)
    d_cl = _window(closings, "LS_timestamp", lo, hi)

    carried = prev_state.select(
        "LS_contract_id",
        F.col("LS_amnt_stable").alias("__amnt"),
        F.col("LS_principal_stable").alias("__principal"),
        F.col("LS_repaid_stable").alias("__repaid"),
    )
    seeded = _window(opening, "LS_timestamp", lo, hi).select(
        "LS_contract_id",
        (F.coalesce(F.col("LS_loan_amnt_stable"), z) + F.coalesce(F.col("LS_cltr_amnt_stable"), z)).alias("__amnt"),
        F.coalesce(F.col("LS_loan_amnt_stable"), z).alias("__principal"),
        z.alias("__repaid"),
    )
    base = carried.unionByName(seeded)

    closed_ids = (
        d_rep.filter(F.col("LS_loan_close")).select("LS_contract_id")
        .unionByName(d_cp.filter(F.col("LS_loan_close")).select("LS_contract_id"))
        .unionByName(d_liq.filter(F.col("LS_loan_close")).select("LS_contract_id"))
        .unionByName(d_cl.select("LS_contract_id"))
        .distinct()
    )
    act = base.join(closed_ids, "LS_contract_id", "left_anti")

    repaid_d = d_rep.groupBy("LS_contract_id").agg(
        F.sum("LS_principal_stable").cast(AMOUNT).alias("__d_repaid")
    )
    closed_d = d_cp.groupBy("LS_contract_id").agg(
        F.sum("LS_payment_amnt_stable").cast(AMOUNT).alias("__d_closed")
    )
    liq_d = d_liq.groupBy("LS_contract_id").agg(
        F.sum("LS_payment_amnt_stable").cast(AMOUNT).alias("__d_liq")
    )
    out = (
        act.join(repaid_d, "LS_contract_id", "left")
        .join(closed_d, "LS_contract_id", "left")
        .join(liq_d, "LS_contract_id", "left")
    )
    principal = F.col("__principal") - F.coalesce(F.col("__d_repaid"), z)
    amnt = (
        F.col("__amnt")
        - F.coalesce(F.col("__d_closed"), z)
        - F.coalesce(F.col("__d_liq"), z)
    )
    return out.select(
        "LS_contract_id",
        hi.alias("LS_timestamp"),
        F.greatest(amnt, z).cast(AMOUNT).alias("LS_amnt_stable"),
        F.greatest(principal, z).cast(AMOUNT).alias("LS_principal_stable"),
        (F.col("__repaid") + F.coalesce(F.col("__d_repaid"), z)).cast(AMOUNT).alias("LS_repaid_stable"),
    )


def lp_pool_state_incremental(
    prev_state: DataFrame,
    deposits: DataFrame,
    withdrawals: DataFrame,
    prev_ts,
    agg_timestamp,
) -> DataFrame:
    """Roll LP_Pool_State forward: TVL' = TVL + Σdelta deposits − Σdelta
    withdrawals per pool (receipts likewise). New pools enter through the
    full-outer join; cost is O(|delta| + |pools|)."""
    lo = F.lit(prev_ts).cast("timestamp")
    hi = F.lit(agg_timestamp).cast("timestamp")
    z = F.lit(0).cast(AMOUNT)

    d = (
        _window(deposits, "LP_timestamp", lo, hi)
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LP_amnt_asset").cast(AMOUNT).alias("__d_dep"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_minted"),
        )
    )
    w = (
        _window(withdrawals, "LP_timestamp", lo, hi)
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LP_amnt_asset").cast(AMOUNT).alias("__d_wd"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_burned"),
        )
    )
    prev = prev_state.select(
        "LP_Pool_id",
        F.col("LP_Pool_total_value_locked_asset").alias("__tvl"),
        F.col("LP_Pool_total_issued_receipts").alias("__receipts"),
    )
    return (
        prev.join(d, "LP_Pool_id", "full_outer")
        .join(w, "LP_Pool_id", "full_outer")
        .select(
            "LP_Pool_id",
            hi.alias("LP_Pool_timestamp"),
            (
                F.coalesce(F.col("__tvl"), z)
                + F.coalesce(F.col("__d_dep"), z)
                - F.coalesce(F.col("__d_wd"), z)
            ).cast(AMOUNT).alias("LP_Pool_total_value_locked_asset"),
            (
                F.coalesce(F.col("__receipts"), z)
                + F.coalesce(F.col("__d_minted"), z)
                - F.coalesce(F.col("__d_burned"), z)
            ).cast(AMOUNT).alias("LP_Pool_total_issued_receipts"),
        )
    )


def lp_lender_state_incremental(
    prev_state: DataFrame,
    deposits: DataFrame,
    withdrawals: DataFrame,
    prev_ts,
    agg_timestamp,
) -> DataFrame:
    """Roll LP_Lender_State forward from the (prev_ts, ts] delta.

    Lenders whose position hit zero are absent from ``prev_state`` (the
    snapshot filters ``receipts > 0``) but re-enter through the
    full-outer join if the delta deposits again — the same
    re-materialization path as a full rebuild, so equivalence holds
    through zero-crossings.
    """
    lo = F.lit(prev_ts).cast("timestamp")
    hi = F.lit(agg_timestamp).cast("timestamp")
    z = F.lit(0).cast(AMOUNT)
    keys = ["LP_address_id", "LP_Pool_id"]

    d = (
        _window(deposits, "LP_timestamp", lo, hi)
        .groupBy(*keys)
        .agg(F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_minted"))
    )
    w = (
        _window(withdrawals, "LP_timestamp", lo, hi)
        .groupBy(*keys)
        .agg(F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_burned"))
    )
    prev = prev_state.select(*keys, F.col("LP_Lender_receipts").alias("__receipts"))
    return (
        prev.join(d, keys, "full_outer")
        .join(w, keys, "full_outer")
        .select(
            *keys,
            hi.alias("LP_timestamp"),
            (
                F.coalesce(F.col("__receipts"), z)
                + F.coalesce(F.col("__d_minted"), z)
                - F.coalesce(F.col("__d_burned"), z)
            ).cast(AMOUNT).alias("LP_Lender_receipts"),
        )
        .filter(F.col("LP_Lender_receipts") > 0)
    )


def pl_state_rollup(
    opening: DataFrame,
    repayments: DataFrame,
    liquidations: DataFrame,
    deposits: DataFrame,
    withdrawals: DataFrame,
    tr_profit: DataFrame,
    tr_rewards: DataFrame,
    prev_ts,
    ts,
) -> DataFrame:
    """Platform-wide interval rollup (`handler/pl_state.rs:13-221`):
    20+ windowed sums/counts over (prev_ts, ts] across the entity tables,
    combined into one row. Includes the treasury tax identity
    ``tax = ΔTR + rewards − profit`` (reference asserts it per interval).

    Spark shape: each source aggregates independently (parallel stages,
    no joins between fact tables), then one single-row crossJoin — the
    cheapest possible combination since every aggregate is scalar.
    """
    lo = F.lit(prev_ts).cast("timestamp")
    hi = F.lit(ts).cast("timestamp")

    def window_of(df: DataFrame, ts_col: str) -> DataFrame:
        return df.filter((F.col(ts_col) > lo) & (F.col(ts_col) <= hi))

    opened = window_of(opening, "LS_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LS_count_open"),
        F.sum("LS_loan_amnt_stable").cast(AMOUNT).alias("PL_LS_loan_amnt_stable"),
    )
    repaid = window_of(repayments, "LS_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LS_count_repay"),
        F.sum("LS_payment_amnt_stable").cast(AMOUNT).alias("PL_LS_repay_amnt_stable"),
    )
    liq = window_of(liquidations, "LS_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LS_count_liquidation"),
        F.sum("LS_payment_amnt_stable").cast(AMOUNT).alias("PL_LS_liquidation_amnt_stable"),
    )
    dep = window_of(deposits, "LP_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LP_count_deposit"),
        F.sum("LP_amnt_asset").cast(AMOUNT).alias("PL_LP_deposit_amnt"),
    )
    wd = window_of(withdrawals, "LP_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LP_count_withdraw"),
        F.sum("LP_amnt_asset").cast(AMOUNT).alias("PL_LP_withdraw_amnt"),
    )
    # Silver-shape columns (schemas.TR_PROFIT / TR_REWARDS_DISTRIBUTION):
    # the tables dict run_aggregation_round consumes carries the
    # *_amnt_stable columns, not the parser-raw TR_*_amnt.
    profit = window_of(tr_profit, "TR_Profit_timestamp").agg(
        F.sum("TR_Profit_amnt_stable").cast(AMOUNT).alias("PL_TR_profit_amnt")
    )
    rewards = window_of(tr_rewards, "TR_Rewards_timestamp").agg(
        F.sum("TR_Rewards_amnt_stable").cast(AMOUNT).alias("PL_TR_rewards_amnt")
    )

    row = opened
    for piece in (repaid, liq, dep, wd, profit, rewards):
        row = row.crossJoin(piece)
    z = F.lit(0).cast(AMOUNT)
    return row.select(
        hi.alias("PL_timestamp"),
        *[F.coalesce(F.col(c), z).alias(c) if c.endswith(("stable", "amnt")) else F.col(c) for c in row.columns],
        # tax identity (pl_state.rs: tax = ΔTR + rewards − profit); ΔTR
        # is supplied by the caller's TR_State pair when available.
        (
            F.coalesce(F.col("PL_TR_rewards_amnt"), z) - F.coalesce(F.col("PL_TR_profit_amnt"), z)
        ).cast("decimal(38,0)").alias("PL_tax_minus_delta_tr"),
    )


def run_aggregation_round(
    tables: dict[str, DataFrame], agg_timestamp, prev_timestamp=None
) -> dict[str, DataFrame]:
    """One aggregation round (SURVEY.md §2.A A12, `main.rs:96-163`,
    `handler/aggregation_task.rs:12-86`): produce every state snapshot
    for a shared ``agg_timestamp``.

    The reference runs LS/LP-lender/LP-pool/TR snapshots as 4 parallel
    tokio tasks, then PL_State, then records ``action_history``. Here the
    returned plans are lazy — materializing them together lets Spark
    schedule the scans concurrently, and the caller appends an
    action_history row after the writes commit (the same
    "snapshot-then-record" ordering that makes the round idempotent).
    With ``prev_timestamp`` the round also emits the PL_State interval
    rollup over (prev_timestamp, agg_timestamp] — the reference's
    "then PL_State" step (`aggregation_task.rs:12-86`).
    """
    out = {
        "LS_State": ls_state_snapshot(
            tables["LS_Opening"],
            tables["LS_Repayment"],
            tables["LS_Close_Position"],
            tables["LS_Liquidation"],
            tables["LS_Closing"],
            agg_timestamp,
        ),
        "LP_Pool_State": lp_pool_state_snapshot(
            tables["LP_Deposit"], tables["LP_Withdraw"], agg_timestamp
        ),
        "LP_Lender_State": lp_lender_state_snapshot(
            tables["LP_Deposit"], tables["LP_Withdraw"], agg_timestamp
        ),
        "TR_State": tr_state_snapshot(tables["TR_Profit"], agg_timestamp),
    }
    if prev_timestamp is not None:
        out["PL_State"] = pl_state_rollup(
            tables["LS_Opening"],
            tables["LS_Repayment"],
            tables["LS_Liquidation"],
            tables["LP_Deposit"],
            tables["LP_Withdraw"],
            tables["TR_Profit"],
            tables["TR_Rewards_Distribution"],
            prev_timestamp,
            agg_timestamp,
        )
    return out
