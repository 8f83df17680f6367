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

# Production silver layout: event tables partitioned by
# `event_date = to_date(<their timestamp column>)`. Every time filter in
# this module goes through `windowed`, which adds the coarse date bound
# whenever the frame carries this column.
PARTITION_DATE_COL = "event_date"


def windowed(
    df: DataFrame,
    ts_col: str,
    lo: Column | object | None = None,
    hi: Column | object | None = None,
    hi_inclusive: bool = True,
    partition_from: str | None = None,
) -> DataFrame:
    """Time-window filter (lo, hi] (or (lo, hi) with
    ``hi_inclusive=False``) that ALSO emits the equivalent coarse
    date-partition predicate when the frame carries the silver layout's
    ``event_date`` column.

    The date bounds are implied by the timestamp bounds (``x > lo ⇒
    date(x) >= date(lo)``, ``x <= hi ⇒ date(x) <= date(hi)``, and the
    exclusive ``x < hi`` still implies ``date(x) <= date(hi)``), so
    adding them never changes a result — but they are the only
    predicates Catalyst can prune Hive-style partitions with: a
    timestamp comparison on a data column reaches the parquet scan as a
    PushedFilter (row-group stats), while the `event_date` comparison
    becomes a PartitionFilter that skips whole directories. At 100 TB
    that is the difference between listing one interval's partitions
    and footer-probing years of history. Audited end-to-end by
    tests/test_plan_audit.py (aggregation-round pruning assertions).

    THE PROVENANCE CONTRACT (advisor r5): the implication above only
    holds when ``event_date`` was derived from the SAME timestamp
    column this call filters on. ``partition_from`` states that
    provenance explicitly — it defaults to ``ts_col`` because the
    silver layout partitions every event table by its own timestamp
    (module note above), which is what every call site in this module
    filters on. A caller filtering a frame on a SECONDARY timestamp
    column must pass the real provenance (``partition_from="<the
    column event_date derives from>"``); the date bound is then only
    emitted when it is actually implied, instead of silently dropping
    rows whose secondary timestamp falls on a different date.
    """
    conds = []
    if lo is not None:
        lo = lo if isinstance(lo, Column) else F.lit(lo).cast("timestamp")
        conds.append(F.col(ts_col) > lo)
    if hi is not None:
        hi = hi if isinstance(hi, Column) else F.lit(hi).cast("timestamp")
        conds.append(F.col(ts_col) <= hi if hi_inclusive else F.col(ts_col) < hi)
    if (partition_from or ts_col) == ts_col and PARTITION_DATE_COL in df.columns:
        if lo is not None:
            conds.append(F.col(PARTITION_DATE_COL) >= F.to_date(lo))
        if hi is not None:
            conds.append(F.col(PARTITION_DATE_COL) <= F.to_date(hi))
    for c in conds:
        df = df.filter(c)
    return df


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
        windowed(df, "LS_timestamp", hi=ts)
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
    opened = windowed(opening, "LS_timestamp", hi=ts)
    act = active_leases(
        opened,
        windowed(repayments, "LS_timestamp", hi=ts),
        windowed(close_positions, "LS_timestamp", hi=ts),
        windowed(liquidations, "LS_timestamp", hi=ts),
        windowed(closings, "LS_timestamp", hi=ts),
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
    """TVL per pool at ``agg_timestamp`` = Σ deposits − Σ withdrawals,
    in both asset and stable denominations (`handler/lp_pool_state.rs:
    13-110`, schema `V001:66-79`; the reference reads live pool balance
    over gRPC — the event-log reconstruction is the deposits/withdrawals
    ledger, whose silver rows carry both LP_amnt_asset and
    LP_amnt_stable). Yield is emitted as 0 exactly like the reference
    (`lp_pool_state.rs:105-106` hardcodes it); borrowed is not an LP-
    ledger fact — attach it with :func:`pools_borrowed` (the open-lease
    principal per pool), as :func:`run_aggregation_round` does."""
    ts = F.lit(agg_timestamp).cast("timestamp")
    sums = lambda side: [  # noqa: E731
        F.sum("LP_amnt_asset").cast(AMOUNT).alias(f"{side}_asset"),
        F.sum("LP_amnt_stable").cast(AMOUNT).alias(f"{side}_stable"),
        F.sum("LP_amnt_receipts").cast(AMOUNT).alias(f"{side}_receipts"),
    ]
    d = (
        windowed(deposits, "LP_timestamp", hi=ts)
        .groupBy("LP_Pool_id")
        .agg(*sums("d"))
    )
    w = (
        windowed(withdrawals, "LP_timestamp", hi=ts)
        .groupBy("LP_Pool_id")
        .agg(*sums("w"))
    )
    z = F.lit(0).cast(AMOUNT)

    def net(col: str):
        return (
            F.coalesce(F.col(f"d_{col}"), z) - F.coalesce(F.col(f"w_{col}"), z)
        ).cast(AMOUNT)

    return d.join(w, "LP_Pool_id", "full_outer").select(
        "LP_Pool_id",
        ts.alias("LP_Pool_timestamp"),
        net("stable").alias("LP_Pool_total_value_locked_stable"),
        net("asset").alias("LP_Pool_total_value_locked_asset"),
        net("receipts").alias("LP_Pool_total_issued_receipts"),
        z.alias("LP_Pool_total_yield_stable"),
    )


def pools_borrowed(ls_state: DataFrame, opening: DataFrame) -> DataFrame:
    """Outstanding principal of open leases per funding pool — the
    reconstruction of LP_Pool_total_borrowed_stable (`V001:72`; the
    reference reads each pool's total_principal_due over gRPC,
    `lp_pool_state.rs:95`). The open set at the snapshot timestamp is
    exactly ``ls_state``; its principal came from the pool named by the
    opening's LS_loan_pool_id, so borrowed = Σ principal per pool.
    One broadcast-sized join (openings projected to two columns) + one
    groupBy on the small open set — no event-log scan."""
    return (
        ls_state.select("LS_contract_id", "LS_principal_stable")
        .join(
            opening.select("LS_contract_id", F.col("LS_loan_pool_id").alias("LP_Pool_id")),
            "LS_contract_id",
        )
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LS_principal_stable").cast(AMOUNT).alias("LP_Pool_total_borrowed_stable")
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
        windowed(deposits, "LP_timestamp", hi=ts)
        .groupBy(*keys)
        .agg(F.sum("LP_amnt_receipts").cast(AMOUNT).alias("minted"))
    )
    w = (
        windowed(withdrawals, "LP_timestamp", hi=ts)
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


def attach_pools_borrowed(
    pool_state: DataFrame, ls_state: DataFrame, opening: DataFrame
) -> DataFrame:
    """LP_Pool_State + LP_Pool_total_borrowed_stable (pools with no open
    leases carry 0, like a pool whose principal_due reads zero)."""
    z = F.lit(0).cast(AMOUNT)
    return pool_state.join(
        pools_borrowed(ls_state, opening), "LP_Pool_id", "left"
    ).withColumn(
        "LP_Pool_total_borrowed_stable",
        F.coalesce(F.col("LP_Pool_total_borrowed_stable"), z),
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
    return windowed(tr_profit, "TR_Profit_timestamp", hi=ts).filter(
        F.col("TR_Profit_amnt_stable") < F.lit(10) ** 10
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
    return windowed(df, ts_col, lo=lo, hi=hi)


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
            F.sum("LP_amnt_stable").cast(AMOUNT).alias("__d_dep_stable"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_minted"),
        )
    )
    w = (
        _window(withdrawals, "LP_timestamp", lo, hi)
        .groupBy("LP_Pool_id")
        .agg(
            F.sum("LP_amnt_asset").cast(AMOUNT).alias("__d_wd"),
            F.sum("LP_amnt_stable").cast(AMOUNT).alias("__d_wd_stable"),
            F.sum("LP_amnt_receipts").cast(AMOUNT).alias("__d_burned"),
        )
    )
    prev = prev_state.select(
        "LP_Pool_id",
        F.col("LP_Pool_total_value_locked_stable").alias("__tvl_stable"),
        F.col("LP_Pool_total_value_locked_asset").alias("__tvl"),
        F.col("LP_Pool_total_issued_receipts").alias("__receipts"),
    )

    def roll(prev_col: str, plus: str, minus: str):
        return (
            F.coalesce(F.col(prev_col), z)
            + F.coalesce(F.col(plus), z)
            - F.coalesce(F.col(minus), z)
        ).cast(AMOUNT)

    return (
        prev.join(d, "LP_Pool_id", "full_outer")
        .join(w, "LP_Pool_id", "full_outer")
        .select(
            "LP_Pool_id",
            hi.alias("LP_Pool_timestamp"),
            roll("__tvl_stable", "__d_dep_stable", "__d_wd_stable").alias(
                "LP_Pool_total_value_locked_stable"
            ),
            roll("__tvl", "__d_dep", "__d_wd").alias("LP_Pool_total_value_locked_asset"),
            roll("__receipts", "__d_minted", "__d_burned").alias(
                "LP_Pool_total_issued_receipts"
            ),
            z.alias("LP_Pool_total_yield_stable"),
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
    closings: DataFrame,
    repayments: DataFrame,
    deposits: DataFrame,
    withdrawals: DataFrame,
    tr_profit: DataFrame,
    tr_rewards: DataFrame,
    ls_state: DataFrame,
    lp_lender_state: DataFrame,
    lp_pool_state: DataFrame,
    tr_state: DataFrame,
    prev_ts,
    last_ts,
    ts,
) -> DataFrame:
    """The reference's FULL PL_State row (`handler/pl_state.rs:13-221`,
    schema `migrations/V001:283-314`) — every column, the same window
    semantics, three action timestamps like `parse_and_insert(prev,
    last, current)`:

    - pools TVL/borrowed/yield: sums over the LP_Pool_State snapshot at
      ``ts`` (`dao/lp_pool_state.rs:88-113`); pass the pool snapshot
      with :func:`pools_borrowed` attached.
    - open counts: row counts of the LS_State / LP_Lender_State
      snapshots at ``ts`` (`dao/ls_state.rs:177`,
      `dao/lp_lender_state.rs:103`).
    - opened/closed/flow legs: windowed over (last_ts, ts] —
      EXCEPT the 5-way repayment breakdown, whose reference DAO uses an
      EXCLUSIVE upper bound (`dao/ls_repayment.rs:149`: ``< $2`` where
      every sibling uses ``<= $2``) — reproduced verbatim.
    - OUT_LS legs: openings joined to closings-in-window
      (`dao/ls_opening.rs:260-304`: LEFT JOIN LS_Closing + WHERE on the
      closing timestamp ≡ inner join).
    - native legs: literal 0 (`pl_state.rs:189-190` hardcodes them).
    - tax identity (`pl_state.rs:160-166`): tax = ΣTR_State(last, ts]
      + rewards − profit − ΣTR_State(prev_ts, last_ts] — the TR_State
      rows are per-round balances, so the window sums reduce to the
      balance delta when one snapshot lands per window.

    Spark shape: every leg is an independent scalar aggregate (parallel
    stages, no fact-to-fact joins except the reference's own
    opening⋈closing), combined by single-row crossJoins — at any scale
    each leg is one partially-aggregated scan of a time-pruned slice.
    """
    prev = F.lit(prev_ts).cast("timestamp")
    last = F.lit(last_ts).cast("timestamp")
    hi = F.lit(ts).cast("timestamp")
    z = F.lit(0).cast(AMOUNT)

    def window_of(df: DataFrame, ts_col: str, inclusive: bool = True) -> DataFrame:
        return windowed(df, ts_col, lo=last, hi=hi, hi_inclusive=inclusive)

    def ssum(col: str, alias: str):
        return F.coalesce(F.sum(col), F.lit(0)).cast(AMOUNT).alias(alias)

    pools = lp_pool_state.agg(
        ssum("LP_Pool_total_value_locked_stable", "PL_pools_TVL_stable"),
        ssum("LP_Pool_total_borrowed_stable", "PL_pools_borrowed_stable"),
        ssum("LP_Pool_total_yield_stable", "PL_pools_yield_stable"),
    )
    ls_open = ls_state.agg(F.count(F.lit(1)).alias("PL_LS_count_open"))
    ls_closed = window_of(closings, "LS_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LS_count_closed")
    )
    opened = window_of(opening, "LS_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LS_count_opened"),
        ssum("LS_cltr_amnt_stable", "PL_IN_LS_cltr_amnt_opened_stable"),
        ssum("LS_loan_amnt_stable", "PL_OUT_LS_loan_amnt_stable"),
    )
    lp_open = lp_lender_state.agg(F.count(F.lit(1)).alias("PL_LP_count_open"))
    wd = window_of(withdrawals, "LP_timestamp").agg(
        F.count(F.when(F.col("LP_deposit_close"), 1)).alias("PL_LP_count_closed"),
        ssum("LP_amnt_stable", "PL_OUT_LP_amnt_stable"),
    )
    dep = window_of(deposits, "LP_timestamp").agg(
        F.count(F.lit(1)).alias("PL_LP_count_opened"),
        ssum("LP_amnt_stable", "PL_IN_LP_amnt_stable"),
    )
    rep = window_of(repayments, "LS_timestamp", inclusive=False).agg(
        ssum("LS_prev_margin_stable", "PL_IN_LS_rep_prev_margin_stable"),
        ssum("LS_prev_interest_stable", "PL_IN_LS_rep_prev_interest_stable"),
        ssum("LS_current_margin_stable", "PL_IN_LS_rep_current_margin_stable"),
        ssum("LS_current_interest_stable", "PL_IN_LS_rep_current_interest_stable"),
        ssum("LS_principal_stable", "PL_IN_LS_rep_principal_stable"),
    )
    out_ls = (
        opening.join(
            window_of(closings, "LS_timestamp").select("LS_contract_id"),
            "LS_contract_id",
        ).agg(
            ssum("LS_cltr_amnt_stable", "PL_OUT_LS_cltr_amnt_stable"),
            F.coalesce(
                F.sum(F.col("LS_loan_amnt_stable") + F.col("LS_cltr_amnt_stable")),
                F.lit(0),
            )
            .cast(AMOUNT)
            .alias("PL_OUT_LS_amnt_stable"),
        )
    )
    profit = window_of(tr_profit, "TR_Profit_timestamp").agg(
        ssum("TR_Profit_amnt_stable", "PL_TR_profit_amnt_stable"),
        ssum("TR_Profit_amnt_nls", "PL_TR_profit_amnt_nls"),
    )
    rewards = window_of(tr_rewards, "TR_Rewards_timestamp").agg(
        ssum("TR_Rewards_amnt_stable", "PL_OUT_TR_rewards_amnt_stable"),
        ssum("TR_Rewards_amnt_nls", "PL_OUT_TR_rewards_amnt_nls"),
    )
    trs_cur = window_of(tr_state, "TR_timestamp").agg(
        ssum("TR_amnt_stable", "__tr_stable"), ssum("TR_amnt_nls", "__tr_nls")
    )
    trs_prev = windowed(tr_state, "TR_timestamp", lo=prev, hi=last).agg(
        ssum("TR_amnt_stable", "__tr_stable_prev"), ssum("TR_amnt_nls", "__tr_nls_prev")
    )

    row = pools
    for piece in (
        ls_open, ls_closed, opened, lp_open, wd, dep, rep, out_ls,
        profit, rewards, trs_cur, trs_prev,
    ):
        row = row.crossJoin(piece)

    def tax(cur: str, rew: str, prof: str, prv: str):
        return (F.col(cur) + F.col(rew) - F.col(prof) - F.col(prv)).cast("decimal(38,0)")

    return row.select(
        hi.alias("PL_timestamp"),
        "PL_pools_TVL_stable",
        "PL_pools_borrowed_stable",
        "PL_pools_yield_stable",
        "PL_LS_count_open",
        "PL_LS_count_closed",
        "PL_LS_count_opened",
        "PL_IN_LS_cltr_amnt_opened_stable",
        "PL_LP_count_open",
        "PL_LP_count_closed",
        "PL_LP_count_opened",
        "PL_OUT_LS_loan_amnt_stable",
        (
            F.col("PL_IN_LS_rep_prev_margin_stable")
            + F.col("PL_IN_LS_rep_prev_interest_stable")
            + F.col("PL_IN_LS_rep_current_margin_stable")
            + F.col("PL_IN_LS_rep_current_interest_stable")
        )
        .cast(AMOUNT)
        # the reference's rep_amnt is the 4 margin/interest legs only —
        # principal is NOT included (`pl_state.rs:89-92`)
        .alias("PL_IN_LS_rep_amnt_stable"),
        "PL_IN_LS_rep_prev_margin_stable",
        "PL_IN_LS_rep_prev_interest_stable",
        "PL_IN_LS_rep_current_margin_stable",
        "PL_IN_LS_rep_current_interest_stable",
        "PL_IN_LS_rep_principal_stable",
        "PL_OUT_LS_cltr_amnt_stable",
        "PL_OUT_LS_amnt_stable",
        z.alias("PL_native_amnt_stable"),
        z.alias("PL_native_amnt_nolus"),
        "PL_IN_LP_amnt_stable",
        "PL_OUT_LP_amnt_stable",
        "PL_TR_profit_amnt_stable",
        "PL_TR_profit_amnt_nls",
        tax("__tr_stable", "PL_OUT_TR_rewards_amnt_stable", "PL_TR_profit_amnt_stable", "__tr_stable_prev").alias(
            "PL_TR_tax_amnt_stable"
        ),
        tax("__tr_nls", "PL_OUT_TR_rewards_amnt_nls", "PL_TR_profit_amnt_nls", "__tr_nls_prev").alias(
            "PL_TR_tax_amnt_nls"
        ),
        "PL_OUT_TR_rewards_amnt_stable",
        "PL_OUT_TR_rewards_amnt_nls",
    )


def run_aggregation_round(
    tables: dict[str, DataFrame],
    agg_timestamp,
    prev_timestamp=None,
    prev_prev_timestamp=None,
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
    With ``prev_timestamp`` (the reference's last_action_timestamp) the
    round also emits the FULL PL_State row over
    (prev_timestamp, agg_timestamp] — the reference's "then PL_State"
    step (`aggregation_task.rs:12-86`, `pl_state.rs:13-221`).
    ``prev_prev_timestamp`` feeds the tax identity's ΔTR window; the
    TR_State history comes from ``tables["TR_State"]`` when the caller
    has prior rounds materialized, else the current round's snapshot
    stands in (the (prev_prev, prev] leg is then 0 — first-round
    semantics, same as the reference's empty table).
    """
    ls_state = ls_state_snapshot(
        tables["LS_Opening"],
        tables["LS_Repayment"],
        tables["LS_Close_Position"],
        tables["LS_Liquidation"],
        tables["LS_Closing"],
        agg_timestamp,
    )
    lp_pool_state = attach_pools_borrowed(
        lp_pool_state_snapshot(
            tables["LP_Deposit"], tables["LP_Withdraw"], agg_timestamp
        ),
        ls_state,
        tables["LS_Opening"],
    )
    tr_state = tr_state_snapshot(tables["TR_Profit"], agg_timestamp)
    out = {
        "LS_State": ls_state,
        "LP_Pool_State": lp_pool_state,
        "LP_Lender_State": lp_lender_state_snapshot(
            tables["LP_Deposit"], tables["LP_Withdraw"], agg_timestamp
        ),
        "TR_State": tr_state,
    }
    if prev_timestamp is not None:
        out["PL_State"] = pl_state_rollup(
            tables["LS_Opening"],
            tables["LS_Closing"],
            tables["LS_Repayment"],
            tables["LP_Deposit"],
            tables["LP_Withdraw"],
            tables["TR_Profit"],
            tables["TR_Rewards_Distribution"],
            out["LS_State"],
            out["LP_Lender_State"],
            lp_pool_state,
            tables.get("TR_State", tr_state),
            prev_prev_timestamp if prev_prev_timestamp is not None else prev_timestamp,
            prev_timestamp,
            agg_timestamp,
        )
    return out
