"""Pipeline-layer queries: the §2.A aggregation engine under the oracle gate.

The snapshot / PnL / platform-rollup pipeline (pipeline/snapshots.py,
pipeline/pnl.py — reference `handler/ls_state.rs`, `lp_pool_state.rs`,
`tr_state.rs`, `pl_state.rs`, `ls_loan_closing.rs`) is exercised by the
pytest suite against hand-built domain fixtures.  The queries here add
the *cross-engine* evidence layer: a deterministic "lease ledger" view is
derived from the driver's own fixture tables (orders → openings,
lineitem → repayment / close-position / liquidation events), the REAL
pipeline functions run on it, and a DuckDB oracle recomputes the same
semantics in ANSI SQL.  Every pipeline family therefore has a driver-
hashable correctness row, not just unit tests.

Derivation contract (identical in Spark and SQL — every rule is chosen
to be bit-reproducible across engines):

- money: ``loan_c`` = exact integer cents of ``o_totalprice`` via a
  decimal(18,4) cast (2-dp doubles are exact at scale 4; ×100 is then an
  integer — no rounding, no .5 ties).  Event amounts are percentages of
  the parent order's loan computed as ``FLOOR(loan_c * k / 100.0)``:
  all-integer products < 2^53, one IEEE double division, one floor —
  the same three operations in both engines give the same bigint.
- events: lineitem rows fan out by ``l_linenumber % 3`` into repayments
  (+1 h), close-positions (+2 h) and liquidations (+3 h); the hour
  offsets make cross-source timestamp ties impossible, so "first
  terminal event" is deterministic.  Event time is
  ``GREATEST(l_shipdate, o_orderdate)`` — the synthetic fixtures allow
  shipdates before the order date, and an event must not predate its
  lease's opening (the incremental roll-forward in q117 relies on it).
- terminal flags: ``l_returnflag = 'R'``; administrative closings are
  'F'-status urgent orders at ``o_orderdate + 30 days``.

Amounts can exceed the outstanding balance (the data is random); both
engines apply the same ``GREATEST(·, 0)`` clamp, and because payment
streams are non-negative the clamp commutes with roll-forward: once a
balance hits zero it stays zero, so q117's incremental path still equals
the full reconstruction without assuming the lifecycle invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.decimals import dec
from ..sources.tables import load
from .registry import query

# Snapshot timestamps, mid-range of the fixture's 1995-2001 order dates.
T0 = "1997-01-01 00:00:00"
T1 = "1998-01-01 00:00:00"
T2 = "1999-07-01 00:00:00"
# PL_State's `current` bound: 01:00:00 lands EXACTLY on repayment
# timestamps (base date + 1 h), so the reference's exclusive upper bound
# on the repayment window (`dao/ls_repayment.rs:149` uses `<` where all
# siblings use `<=`) actually bites at sf0.01/0.1 — a `<=` mistake in
# either engine flips the hash.
T2B = "1999-07-01 01:00:00"


def _cents(col: str) -> Column:
    """Exact integer cents of a 2-dp double price, as BIGINT."""
    return (dec(col) * 100).cast("decimal(38,0)").cast("long")


def _pct(base: Column, mult: Column | int) -> Column:
    """FLOOR(base * mult / 100.0): integer-exact product, one shared IEEE
    division — identical in Spark and DuckDB."""
    m = F.lit(mult) if isinstance(mult, int) else mult
    return F.floor(base * m / F.lit(100.0))


def lease_opening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → LS_Opening-shaped frame (loan = o_totalprice in cents,
    collateral = 40% of loan).

    Every 4th contract (id % 4 = 2) is a Short position funded in LPN
    symbol ``LPN{id % 7}``; the debt-revaluation price is NOT carried
    here — it is resolved at the close *timestamp* by an as-of join
    against the :func:`lpn_prices` series inside
    ``compute_loan_closings`` (matching `ls_loan_closing.rs:582-664`,
    which prices Short debt when the close event arrives, not at open).
    """
    o = load(spark, sf_dir, "orders")
    loan = _cents("o_totalprice")
    cid = F.col("o_orderkey")
    return o.select(
        cid.alias("LS_contract_id"),
        F.col("o_custkey").alias("LS_address_id"),
        F.col("o_orderdate").alias("LS_timestamp"),
        loan.alias("loan_c"),
        loan.alias("LS_loan_amnt"),
        loan.alias("LS_loan_amnt_stable"),
        F.floor(loan * F.lit(0.4)).alias("LS_cltr_amnt_stable"),
        F.when(cid % 4 == 2, F.lit("Short"))
        .otherwise(F.lit("Long"))
        .alias("LS_position_type"),
        F.concat(F.lit("LPN"), (cid % 7).cast("string")).alias("lpn_symbol"),
        # funding pool: same 8-pool universe as the LP ledger, so the
        # borrowed-per-pool overlay (pools_borrowed) has real join keys
        (cid % 8).alias("LS_loan_pool_id"),
    )


def lpn_prices(spark: SparkSession) -> DataFrame:
    """Deterministic LPN price series: 7 symbols × 120 monthly ticks
    from 1994-01, price = 1 + (symbol + month) % 7 — integer-valued so
    the Short debt revaluation stays exact in both engines, yet
    time-varying so ONLY a correct as-of-at-close lookup reproduces the
    oracle (a carried per-contract constant no longer can)."""
    syms = spark.range(7).select(F.col("id").alias("s"))
    months = spark.range(120).select(F.col("id").alias("m"))
    return syms.crossJoin(months).select(
        F.concat(F.lit("LPN"), F.col("s").cast("string")).alias("lpn_symbol"),
        F.to_timestamp(
            F.add_months(F.lit("1994-01-01").cast("date"), F.col("m"))
        ).alias("ts"),
        (1 + (F.col("s") + F.col("m")) % 7).cast("decimal(38,18)").alias("price"),
    )


def _ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ opening: the shared event base (ln, base_ts, flag, loan_c)."""
    l = load(spark, sf_dir, "lineitem")
    o = lease_opening(spark, sf_dir).select(
        "LS_contract_id", "loan_c", F.col("LS_timestamp").alias("__open_ts")
    )
    return (
        l.join(o, l.l_orderkey == o.LS_contract_id)
        .select(
            "LS_contract_id",
            F.col("l_linenumber").alias("ln"),
            F.greatest(F.col("l_shipdate"), F.col("__open_ts")).alias("base_ts"),
            (F.col("l_returnflag") == "R").alias("LS_loan_close"),
            "loan_c",
        )
    )


def _event_stream(led: DataFrame, residue: int, hours: int) -> DataFrame:
    """One of the three event streams: principal = ln% of loan, payment =
    12·ln% of loan, timestamp offset by ``hours``. The repayment stream
    (residue 1) also carries the reference's 5-way breakdown
    (`V001:144-148`): margin/interest legs as 2·ln%..5·ln% of the loan —
    each the same exact FLOOR(int·k/100.0) construction."""
    cols = [
        "LS_contract_id",
        (F.col("base_ts") + F.expr(f"INTERVAL {hours} HOURS")).alias("LS_timestamp"),
        "LS_loan_close",
        _pct(F.col("loan_c"), F.col("ln")).alias("LS_principal_stable"),
        _pct(F.col("loan_c"), F.col("ln") * 12).alias("LS_payment_amnt_stable"),
    ]
    if residue == 1:
        cols += [
            _pct(F.col("loan_c"), F.col("ln") * k).alias(name)
            for k, name in (
                (2, "LS_prev_margin_stable"),
                (3, "LS_prev_interest_stable"),
                (4, "LS_current_margin_stable"),
                (5, "LS_current_interest_stable"),
            )
        ]
    return led.filter(F.col("ln") % 3 == residue).select(*cols)


def lease_events(spark: SparkSession, sf_dir: str):
    """(repayments, close_positions, liquidations, closings)."""
    led = _ledger(spark, sf_dir)
    repay = _event_stream(led, 1, 1)
    closepos = _event_stream(led, 2, 2)
    liq = _event_stream(led, 0, 3)
    closings = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & F.col("o_orderpriority").startswith("1"))
        .select(
            F.col("o_orderkey").alias("LS_contract_id"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("LS_timestamp"),
        )
    )
    return repay, closepos, liq, closings


# SQL twin of the derivation above, shared by every oracle below.
LEASE_CTES = """
opening AS (
  SELECT o_orderkey AS LS_contract_id,
         o_custkey AS LS_address_id,
         o_orderdate AS LS_timestamp,
         o_orderkey % 8 AS LS_loan_pool_id,
         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS DECIMAL(38,0)) AS BIGINT) AS loan_c
  FROM orders
),
led AS (
  SELECT l.l_orderkey AS LS_contract_id,
         l.l_linenumber AS ln,
         GREATEST(l.l_shipdate, o.LS_timestamp) AS base_ts,
         (l.l_returnflag = 'R') AS LS_loan_close,
         o.loan_c
  FROM lineitem l JOIN opening o ON o.LS_contract_id = l.l_orderkey
),
repay AS (
  SELECT LS_contract_id, base_ts + INTERVAL 1 HOUR AS LS_timestamp, LS_loan_close,
         CAST(FLOOR(loan_c * ln / 100.0) AS BIGINT) AS LS_principal_stable,
         CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) AS LS_payment_amnt_stable,
         CAST(FLOOR(loan_c * ln * 2 / 100.0) AS BIGINT) AS LS_prev_margin_stable,
         CAST(FLOOR(loan_c * ln * 3 / 100.0) AS BIGINT) AS LS_prev_interest_stable,
         CAST(FLOOR(loan_c * ln * 4 / 100.0) AS BIGINT) AS LS_current_margin_stable,
         CAST(FLOOR(loan_c * ln * 5 / 100.0) AS BIGINT) AS LS_current_interest_stable
  FROM led WHERE ln % 3 = 1
),
closepos AS (
  SELECT LS_contract_id, base_ts + INTERVAL 2 HOUR AS LS_timestamp, LS_loan_close,
         CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) AS LS_payment_amnt_stable
  FROM led WHERE ln % 3 = 2
),
liq AS (
  SELECT LS_contract_id, base_ts + INTERVAL 3 HOUR AS LS_timestamp, LS_loan_close,
         CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) AS LS_payment_amnt_stable
  FROM led WHERE ln % 3 = 0
),
closings AS (
  SELECT o_orderkey AS LS_contract_id,
         o_orderdate + INTERVAL 30 DAY AS LS_timestamp
  FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority LIKE '1%'
)
"""


def _ls_state_oracle(ts: str) -> str:
    """Full LS_State reconstruction at ``ts`` — oracle twin of
    pipeline.snapshots.ls_state_snapshot."""
    return f"""
    WITH {LEASE_CTES},
    r AS (SELECT * FROM repay WHERE LS_timestamp <= TIMESTAMP '{ts}'),
    c AS (SELECT * FROM closepos WHERE LS_timestamp <= TIMESTAMP '{ts}'),
    q AS (SELECT * FROM liq WHERE LS_timestamp <= TIMESTAMP '{ts}'),
    cl AS (SELECT * FROM closings WHERE LS_timestamp <= TIMESTAMP '{ts}'),
    closed AS (
      SELECT LS_contract_id FROM r WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM c WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM q WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM cl
    ),
    act AS (
      SELECT * FROM opening o
      WHERE o.LS_timestamp <= TIMESTAMP '{ts}'
        AND NOT EXISTS (SELECT 1 FROM closed x WHERE x.LS_contract_id = o.LS_contract_id)
    ),
    rs AS (SELECT LS_contract_id, SUM(LS_principal_stable) AS repaid FROM r GROUP BY 1),
    cs AS (SELECT LS_contract_id, SUM(LS_payment_amnt_stable) AS closed_amt FROM c GROUP BY 1),
    qs AS (SELECT LS_contract_id, SUM(LS_payment_amnt_stable) AS liq_amt FROM q GROUP BY 1)
    SELECT a.LS_contract_id,
           TIMESTAMP '{ts}' AS LS_timestamp,
           CAST(GREATEST(a.loan_c + CAST(FLOOR(a.loan_c * 0.4) AS BIGINT)
                         - COALESCE(cs.closed_amt, 0) - COALESCE(qs.liq_amt, 0), 0) AS BIGINT)
             AS LS_amnt_stable,
           CAST(GREATEST(a.loan_c - COALESCE(rs.repaid, 0), 0) AS BIGINT) AS LS_principal_stable,
           CAST(COALESCE(rs.repaid, 0) AS BIGINT) AS LS_repaid_stable
    FROM act a
    LEFT JOIN rs ON rs.LS_contract_id = a.LS_contract_id
    LEFT JOIN cs ON cs.LS_contract_id = a.LS_contract_id
    LEFT JOIN qs ON qs.LS_contract_id = a.LS_contract_id
    """


def _bigint(df: DataFrame, *cols: str) -> DataFrame:
    """Present decimal pipeline outputs as BIGINT (driver result-type policy)."""
    return df.select(
        *[F.col(c).cast("long").alias(c) if c in cols else F.col(c) for c in df.columns]
    )


@query(
    "q111_ls_state_snapshot",
    oracle=_ls_state_oracle(T1),
    doc="A13 LS_State snapshot (pipeline/snapshots.py::ls_state_snapshot, "
    "`handler/ls_state.rs:16-127` reconstructed from the event log): open "
    "set = anti-join vs every close source, balances = per-contract "
    "cumulative sums at the snapshot timestamp. Runs the real pipeline "
    "function on the lease-ledger view of the driver fixtures.",
)
def q111_ls_state_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import ls_state_snapshot

    repay, closepos, liq, closings = lease_events(spark, sf_dir)
    out = ls_state_snapshot(lease_opening(spark, sf_dir), repay, closepos, liq, closings, T1)
    return _bigint(out, "LS_amnt_stable", "LS_principal_stable", "LS_repaid_stable")


@query(
    "q112_realized_pnl",
    oracle=f"""
    WITH {LEASE_CTES},
    lpnpx AS (
      -- the same 7x120 monthly LPN price series as plans.domain.lpn_prices
      SELECT 'LPN' || CAST(t.s AS VARCHAR) AS lpn_symbol,
             TIMESTAMP '1994-01-01' + to_months(CAST(u.m AS INT)) AS ts,
             1 + (t.s + u.m) % 7 AS price
      FROM range(7) t(s) CROSS JOIN range(120) u(m)
    ),
    term0 AS (
      SELECT LS_contract_id, 'repay' AS close_type, MIN(LS_timestamp) AS close_ts
      FROM repay WHERE LS_loan_close GROUP BY 1
      UNION ALL
      SELECT LS_contract_id, 'market-close', MIN(LS_timestamp)
      FROM closepos WHERE LS_loan_close GROUP BY 1
      UNION ALL
      SELECT LS_contract_id, 'liquidation', MIN(LS_timestamp)
      FROM liq WHERE LS_loan_close GROUP BY 1
      UNION ALL
      SELECT LS_contract_id, 'repay', MIN(LS_timestamp) FROM closings GROUP BY 1
    ),
    term AS (
      SELECT LS_contract_id, close_type, close_ts FROM term0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY LS_contract_id ORDER BY close_ts, close_type) = 1
    ),
    rs AS (SELECT LS_contract_id, SUM(LS_payment_amnt_stable) AS repaid FROM repay GROUP BY 1),
    cs AS (SELECT LS_contract_id, SUM(LS_payment_amnt_stable) AS closed_amt FROM closepos GROUP BY 1),
    qs AS (SELECT LS_contract_id, SUM(LS_payment_amnt_stable) AS liq_amt FROM liq GROUP BY 1),
    closingrows AS (
      SELECT o.LS_address_id,
             CASE WHEN t.close_type = 'liquidation'
                  THEN -(COALESCE(rs.repaid, 0) + CAST(FLOOR(o.loan_c * 0.4) AS BIGINT))
                  ELSE COALESCE(rs.repaid, 0) + COALESCE(cs.closed_amt, 0) + COALESCE(qs.liq_amt, 0)
                       -- Short debt is LPN-denominated: revalue by the
                       -- as-of price AT THE CLOSE TIMESTAMP — the
                       -- reference's LATERAL pick-latest shape
                       -- (`ls_opening.rs:1460-1467` pattern applied to
                       -- `ls_loan_closing.rs:582-664`); the engine side
                       -- resolves the same lookup with operators/asof.py
                       - o.loan_c * (CASE WHEN o.LS_contract_id % 4 = 2
                                          THEN (SELECT px.price FROM lpnpx px
                                                WHERE px.lpn_symbol = 'LPN' || CAST(o.LS_contract_id % 7 AS VARCHAR)
                                                  AND px.ts <= t.close_ts
                                                ORDER BY px.ts DESC LIMIT 1)
                                          ELSE 1 END)
                       - CAST(FLOOR(o.loan_c * 0.4) AS BIGINT)
             END AS pnl
      FROM opening o
      JOIN term t ON t.LS_contract_id = o.LS_contract_id
      LEFT JOIN rs ON rs.LS_contract_id = o.LS_contract_id
      LEFT JOIN cs ON cs.LS_contract_id = o.LS_contract_id
      LEFT JOIN qs ON qs.LS_contract_id = o.LS_contract_id
    )
    SELECT LS_address_id,
           CAST(SUM(pnl) AS BIGINT) AS realized_pnl,
           COUNT(*) AS n_closed,
           CAST(COUNT(*) FILTER (WHERE pnl > 0) AS DOUBLE) / COUNT(*) AS win_rate
    FROM closingrows GROUP BY 1
    """,
    doc="A18 PnL engine (pipeline/pnl.py::compute_loan_closings + "
    "realized_pnl_by_address, `ls_loan_closing.rs:359-802`): close-cause "
    "precedence by earliest terminal event, Long formula proceeds − debt "
    "− downpayment, Short revalues the debt by the as-of LPN price AT "
    "the close timestamp — resolved by operators/asof.py inside the PnL "
    "engine against a time-varying series, with the oracle running the "
    "reference's LATERAL pick-latest independently "
    "(`ls_loan_closing.rs:582-664`; the id%4=2 cohort), liquidation "
    "−(repaid + downpayment), rolled up per address with win rate.",
)
def q112_realized_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.pnl import compute_loan_closings, realized_pnl_by_address

    opening = lease_opening(spark, sf_dir)
    repay, closepos, liq, closings = lease_events(spark, sf_dir)
    lc = compute_loan_closings(
        opening, repay, closepos, liq, closings, lpn_prices=lpn_prices(spark)
    )
    out = realized_pnl_by_address(lc, opening)
    return _bigint(out, "realized_pnl")


# LP ledger: deposits = even line numbers (pool = l_partkey % 8, lender
# = l_suppkey); withdrawals are DERIVED from deposits — 30% of every
# even-cent deposit, 7 days later — so the domain invariant "you cannot
# withdraw receipts you do not hold" is honored at every timestamp (a
# lender's cumulative burned receipts never exceed 30% of deposits made
# at least a week earlier). The lender-state incremental roll-forward
# (q120) RELIES on that invariant: the snapshot drops non-positive
# positions, which only round-trips when positions cannot go negative.
LP_CTES = """
dep AS (
  SELECT LP_Pool_id, LP_address_id, LP_timestamp, LP_amnt_asset,
         CAST(FLOOR(LP_amnt_asset * 101 / 100.0) AS BIGINT) AS LP_amnt_stable,
         CAST(FLOOR(LP_amnt_asset * 0.8) AS BIGINT) AS LP_amnt_receipts
  FROM (
    SELECT l_partkey % 8 AS LP_Pool_id,
           l_suppkey AS LP_address_id,
           l_shipdate AS LP_timestamp,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS DECIMAL(38,0)) AS BIGINT) AS LP_amnt_asset
    FROM lineitem WHERE l_linenumber % 2 = 0
  )
),
wd AS (
  SELECT LP_Pool_id, LP_address_id, LP_timestamp, LP_amnt_asset,
         CAST(FLOOR(LP_amnt_asset * 101 / 100.0) AS BIGINT) AS LP_amnt_stable,
         CAST(FLOOR(LP_amnt_receipts * 0.3) AS BIGINT) AS LP_amnt_receipts,
         (LP_amnt_asset % 4 = 0) AS LP_deposit_close
  FROM (
    SELECT LP_Pool_id, LP_address_id,
           LP_timestamp + INTERVAL 7 DAY AS LP_timestamp,
           CAST(FLOOR(LP_amnt_asset * 0.3) AS BIGINT) AS LP_amnt_asset,
           LP_amnt_receipts
    FROM dep WHERE LP_amnt_asset % 2 = 0
  )
)
"""


def lp_events(spark: SparkSession, sf_dir: str):
    """(deposits, withdrawals) — domain-valid LP ledger view of lineitem.
    Both frames carry asset AND stable amounts (stable = 101% of asset,
    the same exact FLOOR construction), and withdrawals carry the
    LP_deposit_close flag the PL_State rollup counts
    (`dao/lp_withdraw.rs:89-107`)."""
    l = load(spark, sf_dir, "lineitem")
    asset = _cents("l_extendedprice")

    def stable_of(asset_col: Column) -> Column:
        return _pct(asset_col, 101).alias("LP_amnt_stable")

    dep = (
        l.filter(F.col("l_linenumber") % 2 == 0)
        .select(
            (F.col("l_partkey") % 8).alias("LP_Pool_id"),
            F.col("l_suppkey").alias("LP_address_id"),
            F.col("l_shipdate").alias("LP_timestamp"),
            asset.alias("LP_amnt_asset"),
            stable_of(asset),
            F.floor(asset * F.lit(0.8)).alias("LP_amnt_receipts"),
        )
    )
    wd_asset = F.floor(F.col("LP_amnt_asset") * F.lit(0.3))
    wd = dep.filter(F.col("LP_amnt_asset") % 2 == 0).select(
        "LP_Pool_id",
        "LP_address_id",
        (F.col("LP_timestamp") + F.expr("INTERVAL 7 DAYS")).alias("LP_timestamp"),
        wd_asset.alias("LP_amnt_asset"),
        stable_of(wd_asset),
        F.floor(F.col("LP_amnt_receipts") * F.lit(0.3)).alias("LP_amnt_receipts"),
        (wd_asset % 4 == 0).alias("LP_deposit_close"),
    )
    return dep, wd


def _lp_pool_oracle(ts: str) -> str:
    return f"""
    WITH {LP_CTES},
    d AS (SELECT LP_Pool_id, SUM(LP_amnt_asset) AS deposited, SUM(LP_amnt_stable) AS dep_stable,
                 SUM(LP_amnt_receipts) AS minted
          FROM dep WHERE LP_timestamp <= TIMESTAMP '{ts}' GROUP BY 1),
    w AS (SELECT LP_Pool_id, SUM(LP_amnt_asset) AS withdrawn, SUM(LP_amnt_stable) AS wd_stable,
                 SUM(LP_amnt_receipts) AS burned
          FROM wd WHERE LP_timestamp <= TIMESTAMP '{ts}' GROUP BY 1)
    SELECT COALESCE(d.LP_Pool_id, w.LP_Pool_id) AS LP_Pool_id,
           TIMESTAMP '{ts}' AS LP_Pool_timestamp,
           CAST(COALESCE(d.dep_stable, 0) - COALESCE(w.wd_stable, 0) AS BIGINT)
             AS LP_Pool_total_value_locked_stable,
           CAST(COALESCE(d.deposited, 0) - COALESCE(w.withdrawn, 0) AS BIGINT)
             AS LP_Pool_total_value_locked_asset,
           CAST(COALESCE(d.minted, 0) - COALESCE(w.burned, 0) AS BIGINT)
             AS LP_Pool_total_issued_receipts,
           CAST(0 AS BIGINT) AS LP_Pool_total_yield_stable
    FROM d FULL OUTER JOIN w ON w.LP_Pool_id = d.LP_Pool_id
    """


def _lp_lender_oracle(ts: str) -> str:
    return f"""
    WITH {LP_CTES},
    d AS (SELECT LP_address_id, LP_Pool_id, SUM(LP_amnt_receipts) AS minted
          FROM dep WHERE LP_timestamp <= TIMESTAMP '{ts}' GROUP BY 1, 2),
    w AS (SELECT LP_address_id, LP_Pool_id, SUM(LP_amnt_receipts) AS burned
          FROM wd WHERE LP_timestamp <= TIMESTAMP '{ts}' GROUP BY 1, 2)
    SELECT * FROM (
      SELECT COALESCE(d.LP_address_id, w.LP_address_id) AS LP_address_id,
             COALESCE(d.LP_Pool_id, w.LP_Pool_id) AS LP_Pool_id,
             TIMESTAMP '{ts}' AS LP_timestamp,
             CAST(COALESCE(d.minted, 0) - COALESCE(w.burned, 0) AS BIGINT) AS LP_Lender_receipts
      FROM d FULL OUTER JOIN w
        ON w.LP_address_id = d.LP_address_id AND w.LP_Pool_id = d.LP_Pool_id
    ) WHERE LP_Lender_receipts > 0
    """


@query(
    "q113_lp_pool_state",
    oracle=_lp_pool_oracle(T2),
    doc="A14 LP_Pool_State snapshot (pipeline/snapshots.py::"
    "lp_pool_state_snapshot, `handler/lp_pool_state.rs:13-110`): TVL and "
    "issued receipts per pool = Σ deposits − Σ withdrawals at the "
    "snapshot timestamp.",
)
def q113_lp_pool_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import lp_pool_state_snapshot

    dep, wd = lp_events(spark, sf_dir)
    out = lp_pool_state_snapshot(dep, wd, T2)
    return _bigint(
        out,
        "LP_Pool_total_value_locked_stable",
        "LP_Pool_total_value_locked_asset",
        "LP_Pool_total_issued_receipts",
        "LP_Pool_total_yield_stable",
    )


@query(
    "q114_lp_lender_state",
    oracle=_lp_lender_oracle(T2),
    doc="A15 LP_Lender_State snapshot (pipeline/snapshots.py::"
    "lp_lender_state_snapshot, `handler/lp_lender_state.rs:13-114`): net "
    "receipts per (lender, pool); zero/negative positions drop.",
)
def q114_lp_lender_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import lp_lender_state_snapshot

    dep, wd = lp_events(spark, sf_dir)
    return _bigint(lp_lender_state_snapshot(dep, wd, T2), "LP_Lender_receipts")


@query(
    "q115_pl_state",
    oracle=f"""
    WITH {LEASE_CTES},
    {LP_CTES.strip()},
    profit AS (
      -- stable leg x1000 so the reference's 1e10 outlier cut
      -- (`tr_profit.rs:221`) bites in the TR_State cumulative legs but
      -- NOT in the (uncut, `tr_profit.rs:80-91`) PL profit window — the
      -- tax identity then proves that asymmetry cross-engine
      SELECT base_ts + INTERVAL 4 HOUR AS ts,
             CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) * 1000 AS st,
             CAST(FLOOR(loan_c * ln / 100.0) AS BIGINT) AS nls
      FROM led WHERE ln = 6
    ),
    rewards AS (
      SELECT base_ts + INTERVAL 5 HOUR AS ts,
             CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) AS st,
             CAST(FLOOR(loan_c * ln / 100.0) AS BIGINT) AS nls
      FROM led WHERE ln = 7
    ),
    win AS (SELECT TIMESTAMP '{T1}' AS lo, TIMESTAMP '{T2B}' AS hi),
    r AS (SELECT * FROM repay WHERE LS_timestamp <= TIMESTAMP '{T2B}'),
    c AS (SELECT * FROM closepos WHERE LS_timestamp <= TIMESTAMP '{T2B}'),
    q AS (SELECT * FROM liq WHERE LS_timestamp <= TIMESTAMP '{T2B}'),
    cl AS (SELECT * FROM closings WHERE LS_timestamp <= TIMESTAMP '{T2B}'),
    closed AS (
      SELECT LS_contract_id FROM r WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM c WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM q WHERE LS_loan_close
      UNION SELECT LS_contract_id FROM cl
    ),
    act AS (
      SELECT * FROM opening o
      WHERE o.LS_timestamp <= TIMESTAMP '{T2B}'
        AND NOT EXISTS (SELECT 1 FROM closed x WHERE x.LS_contract_id = o.LS_contract_id)
    ),
    rs AS (SELECT LS_contract_id, SUM(LS_principal_stable) AS repaid FROM r GROUP BY 1),
    openprin AS (
      SELECT a.LS_loan_pool_id AS pool,
             GREATEST(a.loan_c - COALESCE(rs.repaid, 0), 0) AS prin
      FROM act a LEFT JOIN rs ON rs.LS_contract_id = a.LS_contract_id
    ),
    poolids AS (
      SELECT DISTINCT LP_Pool_id FROM (
        SELECT LP_Pool_id FROM dep WHERE LP_timestamp <= TIMESTAMP '{T2B}'
        UNION ALL
        SELECT LP_Pool_id FROM wd WHERE LP_timestamp <= TIMESTAMP '{T2B}'
      )
    ),
    dl AS (SELECT LP_address_id, LP_Pool_id, SUM(LP_amnt_receipts) AS m
           FROM dep WHERE LP_timestamp <= TIMESTAMP '{T2B}' GROUP BY 1, 2),
    wl AS (SELECT LP_address_id, LP_Pool_id, SUM(LP_amnt_receipts) AS b
           FROM wd WHERE LP_timestamp <= TIMESTAMP '{T2B}' GROUP BY 1, 2),
    lenders AS (
      SELECT COALESCE(dl.m, 0) - COALESCE(wl.b, 0) AS net
      FROM dl FULL OUTER JOIN wl
        ON wl.LP_address_id = dl.LP_address_id AND wl.LP_Pool_id = dl.LP_Pool_id
    ),
    trc AS (
      SELECT CAST(COALESCE(SUM(st) FILTER (WHERE ts <= TIMESTAMP '{T2B}'), 0) AS BIGINT) AS st_hi,
             CAST(COALESCE(SUM(nls) FILTER (WHERE ts <= TIMESTAMP '{T2B}'), 0) AS BIGINT) AS nls_hi,
             CAST(COALESCE(SUM(st) FILTER (WHERE ts <= TIMESTAMP '{T1}'), 0) AS BIGINT) AS st_lo,
             CAST(COALESCE(SUM(nls) FILTER (WHERE ts <= TIMESTAMP '{T1}'), 0) AS BIGINT) AS nls_lo
      FROM profit WHERE st < 10000000000
    ),
    pw AS (
      SELECT CAST(COALESCE(SUM(st), 0) AS BIGINT) AS st, CAST(COALESCE(SUM(nls), 0) AS BIGINT) AS nls
      FROM profit, win WHERE ts > lo AND ts <= hi
    ),
    rw AS (
      SELECT CAST(COALESCE(SUM(st), 0) AS BIGINT) AS st, CAST(COALESCE(SUM(nls), 0) AS BIGINT) AS nls
      FROM rewards, win WHERE ts > lo AND ts <= hi
    )
    SELECT TIMESTAMP '{T2B}' AS PL_timestamp,
           (SELECT CAST(
              (SELECT COALESCE(SUM(LP_amnt_stable), 0) FROM dep WHERE LP_timestamp <= TIMESTAMP '{T2B}')
            - (SELECT COALESCE(SUM(LP_amnt_stable), 0) FROM wd WHERE LP_timestamp <= TIMESTAMP '{T2B}')
            AS BIGINT)) AS PL_pools_TVL_stable,
           (SELECT CAST(COALESCE(SUM(prin), 0) AS BIGINT) FROM openprin
            WHERE pool IN (SELECT LP_Pool_id FROM poolids)) AS PL_pools_borrowed_stable,
           CAST(0 AS BIGINT) AS PL_pools_yield_stable,
           (SELECT COUNT(*) FROM act) AS PL_LS_count_open,
           (SELECT COUNT(*) FROM closings, win WHERE LS_timestamp > lo AND LS_timestamp <= hi) AS PL_LS_count_closed,
           (SELECT COUNT(*) FROM opening, win WHERE LS_timestamp > lo AND LS_timestamp <= hi) AS PL_LS_count_opened,
           (SELECT CAST(COALESCE(SUM(CAST(FLOOR(loan_c * 0.4) AS BIGINT)), 0) AS BIGINT)
            FROM opening, win WHERE LS_timestamp > lo AND LS_timestamp <= hi) AS PL_IN_LS_cltr_amnt_opened_stable,
           (SELECT COUNT(*) FROM lenders WHERE net > 0) AS PL_LP_count_open,
           (SELECT COUNT(*) FILTER (WHERE LP_deposit_close) FROM wd, win
            WHERE LP_timestamp > lo AND LP_timestamp <= hi) AS PL_LP_count_closed,
           (SELECT COUNT(*) FROM dep, win WHERE LP_timestamp > lo AND LP_timestamp <= hi) AS PL_LP_count_opened,
           (SELECT CAST(COALESCE(SUM(loan_c), 0) AS BIGINT) FROM opening, win
            WHERE LS_timestamp > lo AND LS_timestamp <= hi) AS PL_OUT_LS_loan_amnt_stable,
           (SELECT CAST(COALESCE(SUM(LS_prev_margin_stable + LS_prev_interest_stable
                                     + LS_current_margin_stable + LS_current_interest_stable), 0) AS BIGINT)
            FROM repay, win WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_amnt_stable,
           (SELECT CAST(COALESCE(SUM(LS_prev_margin_stable), 0) AS BIGINT) FROM repay, win
            WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_prev_margin_stable,
           (SELECT CAST(COALESCE(SUM(LS_prev_interest_stable), 0) AS BIGINT) FROM repay, win
            WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_prev_interest_stable,
           (SELECT CAST(COALESCE(SUM(LS_current_margin_stable), 0) AS BIGINT) FROM repay, win
            WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_current_margin_stable,
           (SELECT CAST(COALESCE(SUM(LS_current_interest_stable), 0) AS BIGINT) FROM repay, win
            WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_current_interest_stable,
           (SELECT CAST(COALESCE(SUM(LS_principal_stable), 0) AS BIGINT) FROM repay, win
            WHERE LS_timestamp > lo AND LS_timestamp < hi) AS PL_IN_LS_rep_principal_stable,
           (SELECT CAST(COALESCE(SUM(CAST(FLOOR(o.loan_c * 0.4) AS BIGINT)), 0) AS BIGINT)
            FROM opening o JOIN (SELECT LS_contract_id FROM closings, win
                                 WHERE LS_timestamp > lo AND LS_timestamp <= hi) x
              ON x.LS_contract_id = o.LS_contract_id) AS PL_OUT_LS_cltr_amnt_stable,
           (SELECT CAST(COALESCE(SUM(o.loan_c + CAST(FLOOR(o.loan_c * 0.4) AS BIGINT)), 0) AS BIGINT)
            FROM opening o JOIN (SELECT LS_contract_id FROM closings, win
                                 WHERE LS_timestamp > lo AND LS_timestamp <= hi) x
              ON x.LS_contract_id = o.LS_contract_id) AS PL_OUT_LS_amnt_stable,
           CAST(0 AS BIGINT) AS PL_native_amnt_stable,
           CAST(0 AS BIGINT) AS PL_native_amnt_nolus,
           (SELECT CAST(COALESCE(SUM(LP_amnt_stable), 0) AS BIGINT) FROM dep, win
            WHERE LP_timestamp > lo AND LP_timestamp <= hi) AS PL_IN_LP_amnt_stable,
           (SELECT CAST(COALESCE(SUM(LP_amnt_stable), 0) AS BIGINT) FROM wd, win
            WHERE LP_timestamp > lo AND LP_timestamp <= hi) AS PL_OUT_LP_amnt_stable,
           (SELECT st FROM pw) AS PL_TR_profit_amnt_stable,
           (SELECT nls FROM pw) AS PL_TR_profit_amnt_nls,
           (SELECT CAST(trc.st_hi - trc.st_lo + rw.st - pw.st AS BIGINT) FROM trc, rw, pw) AS PL_TR_tax_amnt_stable,
           (SELECT CAST(trc.nls_hi - trc.nls_lo + rw.nls - pw.nls AS BIGINT) FROM trc, rw, pw) AS PL_TR_tax_amnt_nls,
           (SELECT st FROM rw) AS PL_OUT_TR_rewards_amnt_stable,
           (SELECT nls FROM rw) AS PL_OUT_TR_rewards_amnt_nls
    """,
    doc="A17 PL_State FULL platform rollup (pipeline/snapshots.py::"
    "pl_state_rollup, `handler/pl_state.rs:13-221`, all 30 columns of "
    "`migrations/V001:283-314`): pools TVL/borrowed/yield from the "
    "borrowed-attached pool snapshot, open counts from the LS/LP-lender "
    "snapshots, opened/closed/flow legs windowed over (last, current] "
    "with the reference's EXCLUSIVE repayment upper bound "
    "(`dao/ls_repayment.rs:149`), OUT_LS legs via the opening x closing "
    "join (`dao/ls_opening.rs:260-304`), and the two-window treasury tax "
    "identity (`pl_state.rs:160-166`) whose cumulative legs apply the "
    "1e10 outlier cut while the profit window does not.",
)
def q115_pl_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import (
        attach_pools_borrowed,
        lp_lender_state_snapshot,
        lp_pool_state_snapshot,
        ls_state_snapshot,
        pl_state_rollup,
        tr_state_snapshot,
    )

    opening = lease_opening(spark, sf_dir)
    repay, closepos, liq, closings = lease_events(spark, sf_dir)
    dep, wd = lp_events(spark, sf_dir)
    led = _ledger(spark, sf_dir)
    amt = _pct(F.col("loan_c"), F.col("ln") * 12)
    nls = _pct(F.col("loan_c"), F.col("ln"))
    profit = led.filter(F.col("ln") == 6).select(
        (F.col("base_ts") + F.expr("INTERVAL 4 HOURS")).alias("TR_Profit_timestamp"),
        (amt * 1000).alias("TR_Profit_amnt_stable"),
        nls.alias("TR_Profit_amnt_nls"),
    )
    rewards = led.filter(F.col("ln") == 7).select(
        (F.col("base_ts") + F.expr("INTERVAL 5 HOURS")).alias("TR_Rewards_timestamp"),
        amt.alias("TR_Rewards_amnt_stable"),
        nls.alias("TR_Rewards_amnt_nls"),
    )
    ls_state = ls_state_snapshot(opening, repay, closepos, liq, closings, T2B)
    pool = attach_pools_borrowed(
        lp_pool_state_snapshot(dep, wd, T2B), ls_state, opening
    )
    lender = lp_lender_state_snapshot(dep, wd, T2B)
    # TR_State history = one balance row per round (T1 and T2B): each tax
    # window then catches exactly one cumulative snapshot, like the
    # reference's per-round TR_State table.
    tr_hist = tr_state_snapshot(profit, T1).unionByName(tr_state_snapshot(profit, T2B))
    out = pl_state_rollup(
        opening, closings, repay, dep, wd, profit, rewards,
        ls_state, lender, pool, tr_hist, T0, T1, T2B,
    )
    return _bigint(out, *[c for c in out.columns if c != "PL_timestamp"])


@query(
    "q116_tr_state",
    oracle=f"""
    WITH {LEASE_CTES}
    SELECT TIMESTAMP '{T2}' AS TR_timestamp,
           CAST(COALESCE(SUM(p), 0) AS BIGINT) AS TR_amnt_stable,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS TR_amnt_nls
    FROM (
      SELECT CAST(FLOOR(loan_c * ln * 12 / 100.0) AS BIGINT) * 1000 AS p,
             CAST(FLOOR(loan_c * ln / 100.0) AS BIGINT) AS n,
             base_ts + INTERVAL 4 HOUR AS ts
      FROM led WHERE ln = 6
    )
    WHERE ts <= TIMESTAMP '{T2}' AND p < 10000000000
    """,
    doc="A16 TR_State snapshot (pipeline/snapshots.py::tr_state_snapshot, "
    "`handler/tr_state.rs:13-58`): cumulative treasury profit with the "
    "reference's 1e10 outlier cut (`tr_profit.rs:221`) — amounts are "
    "scaled x1000 so the cut actually bites on fixture data.",
)
def q116_tr_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import tr_state_snapshot

    led = _ledger(spark, sf_dir)
    profit = led.filter(F.col("ln") == 6).select(
        (F.col("base_ts") + F.expr("INTERVAL 4 HOURS")).alias("TR_Profit_timestamp"),
        (_pct(F.col("loan_c"), F.col("ln") * 12) * 1000).alias("TR_Profit_amnt_stable"),
        _pct(F.col("loan_c"), F.col("ln")).alias("TR_Profit_amnt_nls"),
    )
    return _bigint(tr_state_snapshot(profit, T2), "TR_amnt_stable", "TR_amnt_nls")


@query(
    "q117_ls_state_incremental",
    oracle=_ls_state_oracle(T2),
    doc="A13 incremental roll-forward (pipeline/snapshots.py::"
    "ls_state_incremental): Spark rolls the T1 snapshot forward using "
    "only (T1, T2] events — O(delta + open set), the hourly-round shape "
    "that at 100 TB replaces re-scanning years of history — while the "
    "oracle recomputes the FULL T2 snapshot from scratch. Hash equality "
    "IS the roll-forward-equals-recompute proof, on the driver's own "
    "fixtures.",
)
def q117_ls_state_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import ls_state_incremental, ls_state_snapshot

    opening = lease_opening(spark, sf_dir)
    repay, closepos, liq, closings = lease_events(spark, sf_dir)
    prev = ls_state_snapshot(opening, repay, closepos, liq, closings, T1)
    out = ls_state_incremental(
        prev, opening, repay, closepos, liq, closings, T1, T2
    )
    return _bigint(out, "LS_amnt_stable", "LS_principal_stable", "LS_repaid_stable")


@query(
    "q118_loan_collects",
    oracle=f"""
    WITH {LEASE_CTES},
    bal AS (
      SELECT LS_contract_id,
             CASE CAST(LS_contract_id % 4 AS INT)
               WHEN 0 THEN 'ATOM' WHEN 1 THEN 'OSMO' WHEN 2 THEN 'USDC' ELSE 'NLS'
             END AS symbol,
             LS_payment_amnt_stable AS amount,
             LS_timestamp
      FROM closepos
    ),
    px AS (
      SELECT CASE CAST(event_id % 3 AS INT)
               WHEN 0 THEN 'ATOM' WHEN 1 THEN 'OSMO' ELSE 'USDC'
             END AS MP_asset_symbol,
             ts AS MP_asset_timestamp,
             CAST(1 + epoch_us(ts) % 9 AS DECIMAL(38,18)) AS MP_price_in_stable
      FROM events
    )
    SELECT b.LS_contract_id,
           b.symbol AS LS_symbol,
           CAST(b.amount AS BIGINT) AS LS_amount,
           CAST(b.amount * p.px AS BIGINT) AS LS_amount_stable
    FROM bal b
    LEFT JOIN LATERAL (
      SELECT MP_price_in_stable AS px FROM px
      WHERE px.MP_asset_symbol = b.symbol AND px.MP_asset_timestamp <= b.LS_timestamp
      ORDER BY px.MP_asset_timestamp DESC LIMIT 1
    ) p ON TRUE
    WHERE b.symbol <> 'NLS' AND b.amount > 0
    """,
    doc="A19 loan-collect capture (pipeline/pnl.py::loan_collects, "
    "`ls_loan_closing.rs:50-297`): non-native close balances priced by "
    "as-of lookup into the price series (operators/asof.py), integer "
    "prices so amount x price is exact cross-engine.",
)
def q118_loan_collects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.pnl import loan_collects

    _repay, closepos, _liq, _closings = lease_events(spark, sf_dir)
    bal = closepos.select(
        "LS_contract_id",
        F.element_at(
            F.array(F.lit("ATOM"), F.lit("OSMO"), F.lit("USDC"), F.lit("NLS")),
            (F.col("LS_contract_id") % 4).cast("int") + 1,
        ).alias("symbol"),
        F.col("LS_payment_amnt_stable").alias("amount"),
        "LS_timestamp",
    )
    e = load(spark, sf_dir, "events")
    prices = e.select(
        F.element_at(
            F.array(F.lit("ATOM"), F.lit("OSMO"), F.lit("USDC")),
            (F.col("event_id") % 3).cast("int") + 1,
        ).alias("MP_asset_symbol"),
        F.col("ts").alias("MP_asset_timestamp"),
        # Price is a pure function of the tick time: rows sharing a
        # (symbol, ts) tie then carry EQUAL prices, so the as-of pick
        # among them is value-deterministic on both engines.
        (1 + F.unix_micros(F.col("ts")) % 9).cast("decimal(38,18)").alias("MP_price_in_stable"),
    )
    out = loan_collects(bal, prices, native_symbol="NLS")
    return _bigint(out, "LS_amount", "LS_amount_stable")


@query(
    "q119_lp_pool_incremental",
    oracle=_lp_pool_oracle(T2),
    doc="A14 incremental roll-forward (pipeline/snapshots.py::"
    "lp_pool_state_incremental): Spark rolls the T1 pool state forward "
    "with only (T1, T2] deposits/withdrawals; the oracle recomputes the "
    "full T2 snapshot. Hash equality proves TVL' = TVL + delta across "
    "pools entering mid-window.",
)
def q119_lp_pool_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import lp_pool_state_incremental, lp_pool_state_snapshot

    dep, wd = lp_events(spark, sf_dir)
    prev = lp_pool_state_snapshot(dep, wd, T1)
    out = lp_pool_state_incremental(prev, dep, wd, T1, T2)
    return _bigint(
        out,
        "LP_Pool_total_value_locked_stable",
        "LP_Pool_total_value_locked_asset",
        "LP_Pool_total_issued_receipts",
        "LP_Pool_total_yield_stable",
    )


@query(
    "q120_lp_lender_incremental",
    oracle=_lp_lender_oracle(T2),
    doc="A15 incremental roll-forward (pipeline/snapshots.py::"
    "lp_lender_state_incremental): per-(lender, pool) positions rolled "
    "by the delta window, re-materializing positions that re-enter after "
    "the >0 filter; oracle = full T2 recompute. Relies on the ledger's "
    "no-overdraw invariant (see LP_CTES note).",
)
def q120_lp_lender_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.snapshots import (
        lp_lender_state_incremental,
        lp_lender_state_snapshot,
    )

    dep, wd = lp_events(spark, sf_dir)
    prev = lp_lender_state_snapshot(dep, wd, T1)
    out = lp_lender_state_incremental(prev, dep, wd, T1, T2)
    return _bigint(out, "LP_Lender_receipts")


@query(
    "q158_push_outbox",
    # Cross-engine contract: the level->PUSH_TYPES mapping, the JSON
    # body built by format_string (byte-identical printf semantics in
    # both engines for ints/strings), the active-only filter, and the
    # per-subscription fan-out join. Warnings are synthesized from the
    # events stream ('error' events as alerts, level cycling 1..4 so
    # the Unsupported branch is exercised); subscriptions from customer
    # (10 per address over 150 addresses, every third inactive).
    oracle="""
    WITH warn AS (
      SELECT 'addr-' || user_id AS address,
             CAST(1 + event_id % 4 AS INT) AS level,
             CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS ltv,
             'position-' || event_id AS contract
      FROM events WHERE event_type = 'error'
    ),
    pd AS (
      SELECT address,
             CASE level WHEN 1 THEN 'Funding'
                        WHEN 2 THEN 'FundingRecommended'
                        WHEN 3 THEN 'FundNow'
                        ELSE 'Unsupported' END AS push_type,
             CASE WHEN level IN (1, 2, 3)
                  THEN '{"level": ' || level || ', "ltv": ' || ltv
                       || ', "position": "' || contract || '"}'
                  ELSE '{}' END AS body
      FROM warn
    ),
    subs AS (
      SELECT 'addr-' || (c_custkey % 150) AS address,
             'https://push.example/' || c_custkey AS endpoint,
             'p256dh-' || c_custkey AS p256dh,
             'auth-' || c_custkey AS auth,
             c_custkey % 3 <> 0 AS active
      FROM customer
    )
    SELECT pd.address, s.endpoint, s.p256dh, s.auth,
           pd.push_type, pd.body,
           CAST(86400 AS BIGINT) AS ttl, 'high' AS urgency
    FROM pd JOIN subs s ON s.address = pd.address AND s.active
    """,
    doc="A24's engine-expressible half (round 10): web-push DISPATCH — "
    "liquidation-warning level mapped to the funding-escalation push "
    "type with the reference's JSON body shape "
    "(types/push.rs:138-147, wasm_ls_liquidation_warning.rs:47-73), "
    "fanned out to each address's ACTIVE subscriptions "
    "(subscription.rs:27-39) with TTL 24h / urgency high "
    "(push.rs:24-27). The transport half (VAPID/ECE/HTTP) stays "
    "stubbed behind an injectable callable — "
    "pipeline/notify.py::deliver_outbox. The subscription dim "
    "broadcasts; the event stream never shuffles for dispatch.",
)
def q158_push_outbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.notify import notification_outbox, warning_push_data

    ev = load(spark, sf_dir, "events")
    warnings = ev.filter(F.col("event_type") == "error").select(
        F.concat(F.lit("addr-"), F.col("user_id")).alias("address"),
        (F.lit(1) + F.col("event_id") % 4).cast("int").alias("level"),
        # floor, not a bare bigint cast: Spark's double->bigint cast
        # truncates where DuckDB's rounds — floor is exact in both
        F.floor(F.col("value")).cast("bigint").cast("string").alias("ltv"),
        F.concat(F.lit("position-"), F.col("event_id")).alias("contract"),
    )
    c = load(spark, sf_dir, "customer")
    subs = c.select(
        F.concat(F.lit("addr-"), F.col("c_custkey") % 150).alias("address"),
        F.concat(F.lit("https://push.example/"), F.col("c_custkey")).alias(
            "endpoint"
        ),
        F.concat(F.lit("p256dh-"), F.col("c_custkey")).alias("p256dh"),
        F.concat(F.lit("auth-"), F.col("c_custkey")).alias("auth"),
        (F.col("c_custkey") % 3 != 0).alias("active"),
    )
    return notification_outbox(warning_push_data(warnings), subs)
