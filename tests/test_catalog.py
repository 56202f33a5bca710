"""SQL catalog surface: plain spark.sql over the registered views must
work and agree with the DataFrame API — the psql-replacement contract."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata corpus not present"
)


def test_register_views_and_raw_sql(spark):
    from trading_etl_spark.catalog import register_views

    names = register_views(spark, SF_DIR)
    assert {"ticks", "ohlc_1m", "dim_currency", "lineitem"} <= set(names)

    # raw SQL join across curated + dim views
    row = spark.sql(
        """
        SELECT count(*) AS n, count(DISTINCT t.currency_pair_code) AS pairs
        FROM ticks t JOIN dim_currency d
          ON t.currency_pair_code = d.currency_pair_code
        """
    ).first()
    assert row["n"] > 0 and row["pairs"] == 6

    # SQL over the candle view must agree with the DataFrame query
    from trading_etl_spark.queries.trading import q_ohlc_1m

    sql_n = spark.sql("SELECT count(*) AS n FROM ohlc_1m").first()["n"]
    df_n = q_ohlc_1m(spark, SF_DIR).count()
    assert sql_n == df_n

    # derived timeframes present in the unioned view
    tfs = {
        r["timeframe_code"]
        for r in spark.sql(
            "SELECT DISTINCT timeframe_code FROM ohlc_all_tf"
        ).collect()
    }
    assert "1m" in tfs and len(tfs) >= 3


def test_sql_views_keep_pushdown(spark):
    """A filtered SQL query over a raw-table view must still push the
    predicate into the parquet scan — views are transparent to Catalyst."""
    from trading_etl_spark.catalog import register_views

    register_views(spark, SF_DIR)
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49.0")
    formatted = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in formatted and "GreaterThan(l_quantity" in formatted, formatted


def test_gate_query_roundtrip_via_sql_views(spark):
    """VERDICT r4 task #4: a gate query expressed purely as spark.sql over
    the registered views must value-match the DataFrame-API twin — the
    catalog is a faithful SQL surface, not a parallel implementation."""
    from trading_etl_spark.catalog import register_views
    from trading_etl_spark.queries.trading import q_latest_tick

    register_views(spark, SF_DIR)
    sql_rows = sorted(
        tuple(r)
        for r in spark.sql(
            """
            SELECT currency_pair_code, r.time AS time, r.bid AS bid, r.ask AS ask
            FROM (SELECT currency_pair_code,
                         max_by(struct(time, bid, ask), time) AS r
                  FROM ticks
                  GROUP BY currency_pair_code)
            """
        ).collect()
    )
    df_rows = sorted(tuple(r) for r in q_latest_tick(spark, SF_DIR).collect())
    assert sql_rows == df_rows and len(sql_rows) == 6


def test_indicator_views_match_query_surface(spark):
    """The r6 catalog additions: SQL over fact_sma_1h must reproduce the
    golden-cross gate query (the reference's users read fact_sma tables in
    SQL; the view is the same cached relation the DataFrame path uses)."""
    from trading_etl_spark.catalog import register_views
    from trading_etl_spark.queries.trading import q_golden_cross

    names = register_views(spark, SF_DIR)
    assert "ohlc_1h" in names and "fact_sma_1h" in names
    sql_rows = sorted(
        tuple(r)
        for r in spark.sql(
            """
            WITH paired AS (
              SELECT s.currency_pair_code, s.timeframe_code, s.time,
                     s.value AS short_value, l.value AS long_value,
                     lag(s.value) OVER w AS prev_short,
                     lag(l.value) OVER w AS prev_long
              FROM fact_sma_1h s
              JOIN fact_sma_1h l
                USING (currency_pair_code, timeframe_code, time)
              WHERE s.period = 14 AND l.period = 28
              WINDOW w AS (PARTITION BY s.currency_pair_code ORDER BY s.time)
            )
            SELECT time AS event_datetime, currency_pair_code,
                   short_value AS price, 0 AS quantity, 'BUY' AS event_type,
                   'SMA' AS trigger_indicator_name,
                   short_value AS trigger_indicator_value,
                   timeframe_code AS trigger_indicator_timeframe,
                   14 AS trigger_indicator_period
            FROM paired
            WHERE prev_short IS NOT NULL AND prev_short <= prev_long
              AND short_value > long_value
            """
        ).collect()
    )
    df_rows = sorted(tuple(r) for r in q_golden_cross(spark, SF_DIR).collect())
    assert sql_rows == df_rows and sql_rows
