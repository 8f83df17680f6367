"""Domain-pipeline tests: bronze event parsing (attribute projection,
interest aliasing, skip path), as-of price enrichment, and the PnL
engine — each against hand-computed expectations mirroring the reference
semantics cited in the module docstrings."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from extract_transform_load_spark.pipeline.enrich import attach_asof_price, enrich_ls_opening
from extract_transform_load_spark.pipeline.parsers import (
    parse_lp_deposit,
    parse_lp_withdraw,
    parse_ls_close_position,
    parse_ls_opening,
    parse_ls_repayment,
    parse_tr_profit,
)
from extract_transform_load_spark.pipeline.pnl import compute_loan_closings
from extract_transform_load_spark.schemas import BRONZE_EVENT, MP_ASSET


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def bronze_row(block, etype, attrs, t="2024-01-01 00:00:00", idx=0):
    return (block, f"hash{block}", idx, etype, ts(t), attrs)


@pytest.fixture(scope="module")
def bronze(spark):
    rows = [
        bronze_row(
            100,
            "wasm-ls-open",
            {
                "id": "lease1", "customer": "addr1", "currency": "ATOM", "air": "85",
                "at": "2024-01-01T00:00:00", "loan-pool-id": "pool1",
                "loan-amount": "1000000", "loan-symbol": "USDC",
                "downpayment-amount": "500000", "downpayment-symbol": "USDC",
            },
        ),
        # repayment, old attribute spelling (prev-/curr-)
        bronze_row(
            110,
            "wasm-ls-repay",
            {
                "height": "110", "to": "lease1", "payment-symbol": "USDC",
                "payment-amount": "200000", "at": "2024-01-02T00:00:00",
                "loan-close": "false", "principal": "150000",
                "prev-margin-interest": "10", "prev-loan-interest": "20",
                "curr-margin-interest": "30", "curr-loan-interest": "40",
            },
        ),
        # repayment, new alias spelling (overdue-/due-), terminal
        bronze_row(
            120,
            "wasm-ls-repay",
            {
                "height": "120", "to": "lease1", "payment-symbol": "USDC",
                "payment-amount": "1400000", "at": "2024-01-03T00:00:00",
                "loan-close": "true", "principal": "850000",
                "overdue-margin-interest": "11", "overdue-loan-interest": "21",
                "due-margin-interest": "31", "due-loan-interest": "41",
            },
        ),
        # close-position WITHOUT height -> must be skipped
        bronze_row(
            130,
            "wasm-ls-close-position",
            {"to": "lease2", "payment-symbol": "USDC", "payment-amount": "5"},
        ),
        bronze_row(
            140,
            "wasm-lp-deposit",
            {
                "height": "140", "from": "lender1", "to": "pool1",
                "at": "2024-01-04T00:00:00", "deposit-amount": "777",
                "deposit-symbol": "USDC", "receipts": "700",
            },
        ),
        bronze_row(
            150,
            "wasm-lp-withdraw",
            {
                "height": "150", "from": "lender1", "to": "pool1",
                "at": "2024-01-05T00:00:00", "withdraw-amount": "111",
                "withdraw-symbol": "USDC", "receipts": "100", "close": "true",
            },
        ),
        bronze_row(
            160,
            "wasm-tr-profit",
            {"height": "160", "at": "2024-01-06T00:00:00",
             "profit-amount-symbol": "USDC", "profit-amount-amount": "999"},
        ),
    ]
    return spark.createDataFrame(rows, BRONZE_EVENT)


def test_parse_ls_opening(bronze):
    rows = parse_ls_opening(bronze).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["LS_contract_id"] == "lease1"
    assert r["LS_interest"] == 85
    assert r["LS_loan_amnt"] == Decimal("1000000")
    assert r["LS_cltr_amnt"] == Decimal("500000")
    assert r["LS_timestamp"] == ts("2024-01-01 00:00:00")


def test_interest_alias_coalesce(bronze):
    rows = {r["LS_repayment_height"]: r for r in parse_ls_repayment(bronze).collect()}
    old, new = rows[110], rows[120]
    # old spelling
    assert old["LS_prev_margin_stable"] == Decimal("10")
    assert old["LS_current_interest_stable"] == Decimal("40")
    # alias spelling lands in the same columns (`event_parsing.rs:195-237`)
    assert new["LS_prev_margin_stable"] == Decimal("11")
    assert new["LS_prev_interest_stable"] == Decimal("21")
    assert new["LS_current_margin_stable"] == Decimal("31")
    assert new["LS_current_interest_stable"] == Decimal("41")
    assert new["LS_loan_close"] is True


def test_missing_height_skip_path(bronze):
    assert parse_ls_close_position(bronze).count() == 0  # `event_parsing.rs:84-111`


def test_parse_lp_and_tr(bronze):
    dep = parse_lp_deposit(bronze).collect()[0]
    assert dep["LP_amnt_asset"] == Decimal("777")
    wd = parse_lp_withdraw(bronze).collect()[0]
    assert wd["LP_deposit_close"] is True
    pr = parse_tr_profit(bronze).collect()[0]
    assert pr["TR_Profit_amnt"] == Decimal("999")


@pytest.fixture(scope="module")
def prices(spark):
    rows = [
        ("ATOM", ts("2023-12-31 00:00:00"), Decimal("9.5"), "p1"),
        ("ATOM", ts("2024-01-01 00:00:00"), Decimal("10"), "p1"),
        ("ATOM", ts("2024-01-02 00:00:00"), Decimal("12"), "p1"),
        ("USDC", ts("2023-12-31 00:00:00"), Decimal("1"), "p1"),
    ]
    return spark.createDataFrame(rows, MP_ASSET)


def test_attach_asof_price(spark, prices):
    df = spark.createDataFrame(
        [("e1", "ATOM", ts("2024-01-01 12:00:00")), ("e2", "ATOM", ts("2023-12-30 00:00:00"))],
        "eid string, sym string, t timestamp",
    )
    out = attach_asof_price(df, prices, symbol_col="sym", ts_col="t", out_col="px")
    got = {r["eid"]: r["px"] for r in out.collect()}
    assert got["e1"] == Decimal("10.000000000000000000")
    assert got["e2"] is None  # before first tick


def test_enrich_ls_opening(bronze, prices):
    opening = parse_ls_opening(bronze).withColumn("LS_position_type", __import__("pyspark").sql.functions.lit(None).cast("string"))
    enriched = enrich_ls_opening(opening, prices).collect()[0]
    # loan 1_000_000 is LPN-denominated (loan-symbol USDC, price 1):
    # the reference prices item.loan_symbol (wasm_ls_open.rs f1), NOT
    # the lease currency -> 1_000_000 stable
    assert enriched["LS_loan_amnt_stable"] == Decimal("1000000")
    # collateral USDC at price 1
    assert enriched["LS_cltr_amnt_stable"] == Decimal("500000")
    assert enriched["LS_opening_price"] == Decimal("10.000000000000000000")
    # position-in-LPN stand-in: loan_stable / lpn_price = 1e6 / 1
    assert enriched["LS_lpn_loan_amnt"] == Decimal("1000000")
    # Long liquidation over STABLE amounts (calculate_liquidation_price):
    # (loan_stable/0.9)/(dp_stable+loan_stable)*asset_price
    expected = (Decimal("1000000") / Decimal("0.9")) / Decimal("1500000") * Decimal("10")
    assert abs(enriched["LS_liquidation_price_at_open"] - expected) < Decimal("1e-9")


def test_pnl_engine(spark, bronze, prices):
    opening = enrich_ls_opening(parse_ls_opening(bronze), prices)
    repayments = parse_ls_repayment(bronze)
    empty_close = spark.createDataFrame(
        [], "LS_contract_id string, LS_payment_amnt_stable decimal(38,0), LS_loan_close boolean, LS_timestamp timestamp"
    )
    closings = spark.createDataFrame([], "LS_contract_id string, LS_timestamp timestamp")
    # stamp stable payments = nominal (USDC price 1)
    import pyspark.sql.functions as F

    repayments = repayments.withColumn(
        "LS_payment_amnt_stable", F.col("LS_payment_amnt")
    )
    out = compute_loan_closings(opening, repayments, empty_close, empty_close, closings).collect()
    assert len(out) == 1
    r = out[0]
    assert r["Type"] == "repay"
    assert r["LS_timestamp"] == ts("2024-01-03 00:00:00")
    # proceeds 1.6e6 − loan_stable 1e6 (LPN-priced) − downpayment 5e5
    # + fee 0 (position stand-in == loan leg) = +1e5
    assert r["LS_pnl"] == Decimal("100000")


def test_parse_warning_autoclose_anomaly_reserve(spark):
    rows = [
        bronze_row(200, "wasm-ls-liquidation-warning",
                   {"lease": "l1", "customer": "a1", "lease-asset": "ATOM", "level": "2",
                    "ltv": "720", "at": "2024-02-01T00:00:00"}),
        bronze_row(201, "wasm-ls-auto-close-position",
                   {"to": "l1", "strategy": "take-profit", "strategy-ltv": "650",
                    "at": "2024-02-02T00:00:00"}),
        bronze_row(202, "wasm-ls-slippage-anomaly",
                   {"customer": "a1", "lease": "l1", "lease-asset": "ATOM",
                    "max-slippage": "40", "at": "2024-02-03T00:00:00"}),
        bronze_row(203, "wasm-reserve-cover-loss",
                   {"to": "l1", "height": "203", "payment-amount": "123",
                    "payment-symbol": "USDC", "at": "2024-02-04T00:00:00"}),
        bronze_row(204, "wasm-reserve-cover-loss", {"to": "l2"}),  # no height -> skipped
    ]
    from extract_transform_load_spark.pipeline.parsers import (
        dispatch,
        parse_ls_auto_close_position,
        parse_ls_liquidation_warning,
        parse_ls_slippage_anomaly,
        parse_reserve_cover_loss,
    )

    bronze = spark.createDataFrame(rows, BRONZE_EVENT)
    w = parse_ls_liquidation_warning(bronze).collect()
    assert len(w) == 1 and w[0]["LS_level"] == 2 and w[0]["LS_ltv"] == Decimal("720")
    ac = parse_ls_auto_close_position(bronze).collect()
    assert ac[0]["LS_Close_Strategy"] == "take-profit"
    an = parse_ls_slippage_anomaly(bronze).collect()
    assert an[0]["LS_max_slipagge"] == Decimal("40")
    rc = parse_reserve_cover_loss(bronze).collect()
    assert len(rc) == 1 and rc[0]["LS_payment_amnt"] == Decimal("123")
    assert len(dispatch(bronze)) == 13


def test_loan_collects(spark, prices):
    from extract_transform_load_spark.pipeline.pnl import loan_collects

    balances = spark.createDataFrame(
        [
            ("l1", "ATOM", 100, ts("2024-01-01 12:00:00")),
            ("l1", "NLS", 999, ts("2024-01-01 12:00:00")),   # native -> excluded
            ("l1", "USDC", 0, ts("2024-01-01 12:00:00")),    # zero -> excluded
        ],
        "LS_contract_id string, symbol string, amount long, LS_timestamp timestamp",
    )
    out = loan_collects(balances, prices).collect()
    assert len(out) == 1
    assert out[0]["LS_symbol"] == "ATOM"
    assert out[0]["LS_amount_stable"] == Decimal("1000")  # 100 * price 10


def test_gold_layer_refresh(spark, tmp_path):
    from extract_transform_load_spark.pipeline.gold import GoldLayer, GoldTable

    layer = GoldLayer()
    state = {"v": 1}
    def builder(s):
        return s.createDataFrame([(state["v"],)], "v int")
    layer.register(GoldTable("t1", builder, str(tmp_path / "gold_t1")))
    layer.refresh(spark, "t1")
    assert layer.read(spark, "t1").collect()[0]["v"] == 1
    state["v"] = 2
    layer.refresh(spark, "t1")  # atomic swap over existing snapshot
    assert layer.read(spark, "t1").collect()[0]["v"] == 2


def test_pnl_short_position(spark, bronze, prices):
    import pyspark.sql.functions as F

    opening = enrich_ls_opening(parse_ls_opening(bronze), prices)
    opening = opening.withColumn("LS_position_type", F.lit("Short")).withColumn(
        "lpn_price_at_close", F.lit("2").cast("decimal(38,18)")
    )
    repayments = parse_ls_repayment(bronze).withColumn(
        "LS_payment_amnt_stable", F.col("LS_payment_amnt")
    )
    empty_close = spark.createDataFrame(
        [], "LS_contract_id string, LS_payment_amnt_stable decimal(38,0), LS_loan_close boolean, LS_timestamp timestamp"
    )
    closings = spark.createDataFrame([], "LS_contract_id string, LS_timestamp timestamp")
    out = compute_loan_closings(opening, repayments, empty_close, empty_close, closings).collect()
    # Short: debt = loan_stable(1e6) × lpn price at close 2 = 2e6
    # pnl = proceeds 1.6e6 − 2e6 − dp 5e5 + fee 0 = −9e5
    assert out[0]["LS_pnl"] == Decimal("-900000")


def test_pnl_short_lpn_price_resolved_as_of_close(spark, bronze, prices):
    """The round-5 path (`ls_loan_closing.rs:582-664` fidelity): the
    Short debt price is NOT carried on the opening — it is looked up
    as-of the close timestamp against a price series. A tick after the
    close must be invisible; the pre-close tick wins."""
    import pyspark.sql.functions as F

    opening = enrich_ls_opening(parse_ls_opening(bronze), prices).withColumn(
        "LS_position_type", F.lit("Short")
    ).withColumn("lpn_symbol", F.lit("LPN1"))
    repayments = parse_ls_repayment(bronze).withColumn(
        "LS_payment_amnt_stable", F.col("LS_payment_amnt")
    )
    close_ts = repayments.select(F.max("LS_timestamp")).collect()[0][0]
    from datetime import timedelta

    series = spark.createDataFrame(
        [
            ("LPN1", close_ts - timedelta(days=1), Decimal("2")),   # as-of winner
            ("LPN1", close_ts + timedelta(days=1), Decimal("99")),  # future: invisible
            ("LPN0", close_ts - timedelta(days=2), Decimal("77")),  # other symbol
        ],
        "lpn_symbol string, ts timestamp, price decimal(38,18)",
    )
    empty_close = spark.createDataFrame(
        [], "LS_contract_id string, LS_payment_amnt_stable decimal(38,0), LS_loan_close boolean, LS_timestamp timestamp"
    )
    closings = spark.createDataFrame([], "LS_contract_id string, LS_timestamp timestamp")
    out = compute_loan_closings(
        opening, repayments, empty_close, empty_close, closings, lpn_prices=series
    ).collect()
    # same arithmetic as the carried-column test: the as-of join must
    # resolve price 2 (the tick 1 day BEFORE close), not 99 or 77
    assert out[0]["LS_pnl"] == Decimal("-900000")


def test_observe_counts_single_pass_metrics(spark):
    """observe() rides the action's own scan: the observation reports
    exact row/flag counts after the write action with no extra query."""
    import pyspark.sql.functions as F

    from extract_transform_load_spark.pipeline.monitor import observe_counts

    df = spark.createDataFrame(
        [(i, "wasm-ls-open" if i % 3 else None) for i in range(30)],
        "id long, event_type string",
    )
    instrumented, obs = observe_counts(
        df,
        {
            "skipped": F.col("event_type").isNull(),
            "parsed": F.col("event_type").isNotNull(),
        },
        name="ingest",
    )
    assert instrumented.count() == 30  # the action that carries the metrics
    got = obs.get
    assert got == {"rows": 30, "skipped": 10, "parsed": 20}


def test_expectation_report_counts_violations(spark):
    from extract_transform_load_spark.pipeline.monitor import (
        expectation_report,
        expect_references,
        expect_unique,
    )

    child = spark.createDataFrame(
        [(1, 10), (1, -5), (2, 20), (None, 30), (9, 40)], "fk int, amount int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")

    rep = {
        r["check_name"]: (r["violations"], r["n_rows"])
        for r in expectation_report(
            child,
            {"neg_amount": F.col("amount") < 0, "null_fk": F.col("fk").isNull()},
        ).collect()
    }
    assert rep == {"neg_amount": (1, 5), "null_fk": (1, 5)}

    uniq = expect_unique(child, "fk").collect()[0]
    # two non-null rows share fk=1 -> one duplicate; nulls don't count
    assert (uniq["check_name"], uniq["violations"], uniq["n_rows"]) == ("unique_fk", 1, 5)

    refs = expect_references(child, "fk", parent, "pk").collect()[0]
    # fk=9 is the only orphan; a NULL fk references nothing and is NOT a
    # violation (standard SQL referential-integrity semantics)
    assert refs["check_name"] == "fk_references_pk"
    assert refs["violations"] == 1 and refs["n_rows"] == 5

    with pytest.raises(ValueError):
        expectation_report(child, {})


def test_profile_table_one_pass_semantics(spark):
    from extract_transform_load_spark.pipeline.monitor import profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, None, 30.0), (3, "b", 5.0)],
        "id int, tag string, score double",
    )
    prof = {
        r["column"]: r
        for r in profile_table(df, ["id", "tag", "score"], numeric=["score"]).collect()
    }
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert (prof["id"]["n_null"], prof["id"]["n_distinct"]) == (0, 3)
    assert (prof["tag"]["n_null"], prof["tag"]["n_distinct"]) == (1, 2)
    assert (prof["score"]["n_null"], prof["score"]["n_distinct"]) == (1, 3)
    assert prof["score"]["min_num"] == 5.0 and prof["score"]["max_num"] == 30.0
    assert prof["id"]["min_num"] is None  # non-numeric columns never string-format

    approx = profile_table(df, ["id"], approx_distinct=True).collect()[0]
    assert abs(approx["n_distinct"] - 3) <= 1


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from extract_transform_load_spark.pipeline.monitor import psi_drift

    a = spark.createDataFrame([(i % 4,) for i in range(100)], "b int")
    same = psi_drift(a, a, F.col("b")).agg(F.sum("contrib").alias("psi")).collect()[0]
    assert same["psi"] == 0.0  # identical cohorts: p_a == p_b exactly

    b = spark.createDataFrame([(i % 2,) for i in range(100)], "b int")
    rows = psi_drift(a, b, F.col("b")).collect()
    assert len(rows) == 4  # full outer keeps one-sided buckets
    psi = sum(r["contrib"] for r in rows)
    assert psi > 0.2  # a real shift registers
    assert all(r["p_a"] > 0 and r["p_b"] > 0 for r in rows)  # smoothing keeps finite


def test_robust_outliers_flags_and_guards(spark):
    from extract_transform_load_spark.pipeline.monitor import robust_outliers

    # group "a": tight cluster around 10 with one wild point;
    # group "b": constant values (MAD = 0) must flag nothing.
    # Deviations have a repeated nonzero median so the approx path
    # (which returns an actual element, not an interpolation) agrees.
    rows = [("a", float(v)) for v in (9, 10, 11, 9, 10, 11, 9, 10, 11, 500)]
    rows += [("b", 7.0)] * 6
    df = spark.createDataFrame(rows, "g string, v double")

    out = robust_outliers(df, ["g"], "v", z=3.0).collect()
    assert [(r["g"], r["v"]) for r in out] == [("a", 500.0)]
    assert out[0]["robust_z"] > 3.0
    assert out[0]["med"] == 10.0 and out[0]["mad"] == 1.0

    approx = robust_outliers(df, ["g"], "v", z=3.0, approx=True).collect()
    assert [(r["g"], r["v"]) for r in approx] == [("a", 500.0)]


def test_end_to_end_bronze_to_endpoint_csv(spark, bronze, prices, tmp_path):
    """Capstone integration: one batch travels the whole medallion —
    bronze dispatch → TR_Profit silver parse → A9 as-of stable
    enrichment → idempotent parquet sink (replaying the SAME batch
    appends zero rows) → treasury/revenue endpoint over the stored
    table → CSV export. Every seam is the production one; the replay
    assertion is the reference's per-block exactly-once (A5/A20) end
    to end."""
    from extract_transform_load_spark.api.endpoints import ENDPOINTS
    from extract_transform_load_spark.pipeline.enrich import attach_asof_price
    from extract_transform_load_spark.pipeline.ingest import dedup_batch, idempotent_append
    from extract_transform_load_spark.pipeline.parsers import dispatch
    from extract_transform_load_spark.sources.sinks import to_csv_string

    silver = dispatch(bronze)["TR_Profit"]
    enriched = attach_asof_price(
        silver, prices, symbol_col="TR_Profit_symbol",
        ts_col="TR_Profit_timestamp", out_col="__price",
    ).withColumn(
        "TR_Profit_amnt_stable",
        (F.col("TR_Profit_amnt").cast("decimal(38,18)") * F.col("__price")).cast("decimal(38,0)"),
    ).drop("__price")

    pk = ["TR_Profit_height", "TR_Profit_idx"]
    path = str(tmp_path / "TR_Profit")
    dedup_batch(enriched, pk, order_col="TR_Profit_height").write.parquet(path)

    # replay the identical batch: the anti-join must admit nothing
    stored = spark.read.parquet(path)
    admitted = idempotent_append(stored, dedup_batch(enriched, pk), pk)
    assert admitted.count() == 0
    assert spark.read.parquet(path).count() == enriched.count() == 1

    out = ENDPOINTS["treasury/revenue"]({"TR_Profit": spark.read.parquet(path)})
    row = out.collect()[0]
    # bronze carries one tr-profit of 999 at 2024-01-06; the fixture
    # price series must have a USDC tick at/before it for the as-of join
    price_row = (
        enriched.select("TR_Profit_amnt_stable").collect()[0]["TR_Profit_amnt_stable"]
    )
    assert row["revenue"] == price_row and price_row is not None

    csv = to_csv_string(out)
    assert csv.splitlines()[0] == "revenue"
    assert str(row["revenue"]) in csv.splitlines()[1]


def test_jdbc_sink_roundtrip_idempotent_append(spark, tmp_path):
    """A5/A20/A21 end-to-end against a REAL JDBC database (embedded
    Derby, which ships with Spark): write a batch through write_jdbc,
    read it back through read_jdbc, then replay an overlapping batch via
    idempotent_append — only the genuinely new keys may land, mirroring
    the reference's ON CONFLICT DO NOTHING loader
    (`dao/postgre/ls_opening.rs:69-192`, pool discipline
    `configuration.rs:893-906`)."""
    from extract_transform_load_spark.pipeline.ingest import idempotent_append
    from extract_transform_load_spark.sources.sinks import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/servingdb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    table = "ls_opening"

    batch1 = spark.createDataFrame(
        [(1, "addr-a", 100.0), (2, "addr-b", 250.5), (3, "addr-c", 17.25)],
        "height bigint, contract string, amount double",
    )
    write_jdbc(batch1, url, table, mode="overwrite", driver=driver, num_partitions=2)

    stored = read_jdbc(spark, url, table, driver=driver)
    assert stored.count() == 3
    assert {r["contract"] for r in stored.collect()} == {"addr-a", "addr-b", "addr-c"}

    # replay: heights 2,3 already present; only height 4 may be admitted
    batch2 = spark.createDataFrame(
        [(2, "addr-b", 250.5), (3, "addr-c", 17.25), (4, "addr-d", 3.5)],
        "height bigint, contract string, amount double",
    )
    admitted = idempotent_append(read_jdbc(spark, url, table, driver=driver), batch2, ["height"])
    assert admitted.count() == 1
    write_jdbc(admitted, url, table, mode="append", driver=driver)

    final = read_jdbc(spark, url, table, driver=driver)
    assert final.count() == 4
    assert final.groupBy("height").count().filter("count > 1").count() == 0

    # replaying the full union admits nothing — the loader is idempotent
    again = idempotent_append(final, batch1.unionByName(batch2), ["height"])
    assert again.count() == 0


def test_a8_raw_tx_decode_bronze_builder(spark):
    """A8: protobuf-wire Tx decode into per-message raw_message rows
    (`event_dispatch.rs:246-279`, `model/raw_message.rs:27-41`) — a
    crafted two-message Tx with fee and memo must yield two rows with
    from/to/type/value/fee/memo populated; a malformed payload is
    skipped like the reference's Err(_) path."""
    from extract_transform_load_spark.pipeline.rawtx import (
        MSG_SEND,
        bronze_raw_messages,
        encode_msg_send,
        encode_test_tx,
    )

    send1 = encode_msg_send("nolus1from", "nolus1to", [("unls", 1500)])
    send2 = encode_msg_send("nolus1other", "nolus1dest", [("usdc", 42), ("unls", 7)])
    tx = encode_test_tx(
        [(MSG_SEND, send1), (MSG_SEND, send2)], memo="hello", fee=("unls", 250)
    )
    txs = spark.createDataFrame(
        [("HASH1", 100, bytearray(tx)), ("HASHBAD", 101, bytearray(b"\xff\xff\xff"))],
        "tx_hash string, block long, tx_data binary",
    )
    rows = {
        (r["tx_hash"], r["index"]): r
        for r in bronze_raw_messages(txs).collect()
    }
    assert set(rows) == {("HASH1", 0), ("HASH1", 1)}  # malformed tx skipped
    r0 = rows[("HASH1", 0)]
    assert r0["from"] == "nolus1from" and r0["to"] == "nolus1to"
    assert r0["type"] == MSG_SEND and r0["value"] == "1500unls"
    assert r0["memo"] == "hello" and r0["fee_denom"] == "unls"
    assert int(r0["fee_amount"]) == 250 and r0["block"] == 100
    r1 = rows[("HASH1", 1)]
    assert r1["value"] == "42usdc,7unls" and r1["from"] == "nolus1other"


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL corpus I/O: distributed gzip-sharded write, schema-pinned
    read (no inference scan), and malformed lines quarantined in
    _corrupt_record instead of failing the scan."""
    import gzip
    import json as _json

    from extract_transform_load_spark.sources.sinks import read_jsonl, write_jsonl_dir

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(100)],
        "doc_id long, text string, lang string",
    ).repartition(4)
    out = str(tmp_path / "shards")
    write_jsonl_dir(docs, out)
    from pathlib import Path

    shards = list(Path(out).glob("part-*.json.gz"))
    assert len(shards) == 4  # one shard per partition, gzip layout

    back = read_jsonl(spark, out, schema="doc_id long, text string, lang string")
    # the quarantine column is auto-appended (round-7 ADVICE fix) so a
    # user schema without it can't silently turn bad lines into nulls
    assert back.columns == ["doc_id", "text", "lang", "_corrupt_record"]
    assert back.count() == 100
    assert {tuple(r) for r in back.drop("_corrupt_record").collect()} == {
        tuple(r) for r in docs.collect()
    }

    # corrupt-line quarantine: the scan survives, the row is flagged —
    # WITHOUT the caller having to spell _corrupt_record in the schema
    bad = tmp_path / "bad"
    bad.mkdir()
    with gzip.open(bad / "shard.json.gz", "wt") as f:
        f.write(_json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}) + "\n")
        f.write("{this is not json\n")
    for schema in (
        "doc_id long, text string, lang string",
        "doc_id long, text string, lang string, _corrupt_record string",
    ):
        rows = read_jsonl(spark, str(bad), schema=schema).collect()
        assert len(rows) == 2
        assert sum(1 for r in rows if r["_corrupt_record"] is not None) == 1

    # the auto-append must not mutate a caller-held StructType (add()
    # appends in place — review finding r7): the shared schema object
    # keeps its original columns after the read
    from pyspark.sql.types import StructType

    shared = StructType.fromDDL("doc_id long, text string, lang string")
    before = shared.fieldNames()
    got2 = read_jsonl(spark, str(bad), schema=shared)
    assert "_corrupt_record" in got2.columns
    assert shared.fieldNames() == before

    # strict-schema callers opt OUT (round-8 ADVICE fix): the returned
    # schema is byte-for-byte the supplied one — safe to union / write
    # to a fixed-schema sink — and the bad line degrades to Spark's
    # plain all-null PERMISSIVE row instead of being flagged
    strict = read_jsonl(
        spark, str(bad), schema="doc_id long, text string, lang string", quarantine=False
    )
    assert strict.columns == ["doc_id", "text", "lang"]
    rows = strict.collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if all(v is None for v in r)) == 1


# ---------------------------------------------------------------------------
# A24 web-push dispatch (round 10): pipeline/notify.py
# ---------------------------------------------------------------------------


def _subs(spark):
    return spark.createDataFrame(
        [
            ("a1", "https://p/1", "k1", "s1", True),
            ("a1", "https://p/2", "k2", "s2", True),
            ("a1", "https://p/3", "k3", "s3", False),  # inactive
            ("a2", "https://p/4", "k4", "s4", True),
        ],
        "address string, endpoint string, p256dh string, auth string, active boolean",
    )


def test_warning_push_levels_and_body(spark):
    """Level 1/2/3 map to the funding-escalation types with the
    reference's JSON body; any other level is Unsupported with an
    empty body (wasm_ls_liquidation_warning.rs:47-73)."""
    from extract_transform_load_spark.pipeline.notify import warning_push_data

    w = spark.createDataFrame(
        [("a1", 1, "57", "c-7"), ("a1", 2, "62", "c-8"),
         ("a2", 3, "80", "c-9"), ("a2", 9, "99", "c-x")],
        "address string, level int, ltv string, contract string",
    )
    got = {r["push_type"]: r["body"] for r in warning_push_data(w).collect()}
    assert got["Funding"] == '{"level": 1, "ltv": 57, "position": "c-7"}'
    assert got["FundingRecommended"] == '{"level": 2, "ltv": 62, "position": "c-8"}'
    assert got["FundNow"] == '{"level": 3, "ltv": 80, "position": "c-9"}'
    assert got["Unsupported"] == "{}"


def test_liquidation_push_causes(spark):
    """The reference's THREE-way cause mapping (model/models.rs:226-234):
    'overdue interest' / 'high liability' match exactly (case-folded);
    any other or garbled cause falls through to Unsupported with an
    EMPTY body, not to FullyLiquidated (ADVICE r10)."""
    from extract_transform_load_spark.pipeline.notify import (
        liquidation_push_data,
    )

    liq = spark.createDataFrame(
        [
            ("a1", "Overdue Interest", "c-1"),
            ("a2", "high liability", "c-2"),
            ("a3", "margin call", "c-3"),  # unknown cause
            ("a4", "overdue", "c-4"),  # prefix of a known cause: NOT a match
        ],
        "address string, cause string, contract string",
    )
    got = {r["address"]: (r["push_type"], r["body"]) for r in liquidation_push_data(liq).collect()}
    assert got == {
        "a1": ("PartiallyLiquidated", '{"position": "c-1"}'),
        "a2": ("FullyLiquidated", '{"position": "c-2"}'),
        "a3": ("Unsupported", "{}"),
        "a4": ("Unsupported", "{}"),
    }


def test_outbox_fans_out_active_only(spark):
    """One delivery row per (notification x ACTIVE subscription) — the
    inactive endpoint never appears (subscription.rs:33); TTL/urgency
    ride every row (push.rs:24-27)."""
    from extract_transform_load_spark.pipeline.notify import (
        notification_outbox,
        warning_push_data,
    )

    w = spark.createDataFrame(
        [("a1", 1, "57", "c-7"), ("a2", 3, "80", "c-9")],
        "address string, level int, ltv string, contract string",
    )
    out = notification_outbox(warning_push_data(w), _subs(spark)).collect()
    by_ep = sorted(r["endpoint"] for r in out)
    assert by_ep == ["https://p/1", "https://p/2", "https://p/4"]
    assert all(r["ttl"] == 86400 and r["urgency"] == "high" for r in out)


def test_deliver_requires_transport_and_deactivates_expired(spark):
    from extract_transform_load_spark.pipeline.notify import (
        deliver_outbox,
        expired_deactivations,
        notification_outbox,
        warning_push_data,
    )

    w = spark.createDataFrame(
        [("a1", 1, "57", "c-7"), ("a2", 3, "80", "c-9")],
        "address string, level int, ltv string, contract string",
    )
    outbox = notification_outbox(warning_push_data(w), _subs(spark))
    with pytest.raises(NotImplementedError, match="transport"):
        deliver_outbox(outbox)
    # a fake transport: endpoint /2 is gone (410), the rest deliver
    results = deliver_outbox(
        outbox,
        transport=lambda ep, p, a, body, ttl, urg: 410 if ep.endswith("/2") else 201,
    )
    dead = [r["endpoint"] for r in expired_deactivations(results).collect()]
    assert dead == ["https://p/2"]


def test_deliver_outbox_bounds_inflight_transport_calls(spark):
    """The buffer_unordered twin (push.rs:46-55, VERDICT r10 wrong #3):
    within an Arrow batch the injected transport runs under a thread
    pool bounded at max_concurrency — the recording fake tracks the
    peak number of simultaneously in-flight calls and pins it >1
    (overlap actually happens on a 1-partition outbox) and <= the
    bound; results stay row-aligned with the input order."""
    import time as _time

    from extract_transform_load_spark.pipeline.notify import deliver_outbox

    outbox = spark.createDataFrame(
        [
            (f"https://p/{i}", f"k{i}", f"s{i}", "{}", 86400, "high")
            for i in range(24)
        ],
        "endpoint string, p256dh string, auth string, body string, "
        "ttl bigint, urgency string",
    ).coalesce(1)

    # mapInPandas executes in a Python WORKER process, so a driver-side
    # counter can't see the fake's state — the fake instead RETURNS its
    # in-flight observation as the status, which flows back as data:
    # status = number of simultaneously in-flight calls observed at
    # entry (>= 2 somewhere proves overlap; <= 4 everywhere proves the
    # bound). The closure's lock/state live in the one worker that owns
    # the single partition.
    # A threading.Lock is not picklable, so the closure ships a plain
    # dict and creates the lock lazily IN the worker — dict.setdefault
    # is a single C call (atomic under the GIL), so every thread gets
    # the same first-stored lock.
    state = {"inflight": 0}

    def transport(ep, p, a, body, ttl, urg):
        import threading as _th

        lk = state.setdefault("lock", _th.Lock())
        with lk:
            state["inflight"] += 1
            seen = state["inflight"]
        _time.sleep(0.05)  # hold the slot so calls genuinely overlap
        with lk:
            state["inflight"] -= 1
        return seen

    rows = deliver_outbox(outbox, transport=transport, max_concurrency=4).collect()
    statuses = {r["endpoint"]: r["status"] for r in rows}
    assert len(statuses) == 24
    peak = max(statuses.values())
    assert 1 < peak <= 4, f"in-flight peak {peak} outside (1, 4]"

    with pytest.raises(ValueError, match="max_concurrency"):
        deliver_outbox(outbox, transport=transport, max_concurrency=0)


def test_outbox_plan_broadcasts_subscription_dim(spark):
    from extract_transform_load_spark.pipeline.notify import (
        notification_outbox,
        warning_push_data,
    )

    w = spark.createDataFrame(
        [("a1", 1, "57", "c-7")], "address string, level int, ltv string, contract string"
    )
    out = notification_outbox(warning_push_data(w), _subs(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
