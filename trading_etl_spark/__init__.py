"""trading_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference FX trading ETL (tker-78/trading-etl).

Architecture (SURVEY.md §7): single-table DataFrames with
``currency_pair_code`` / ``timeframe_code`` columns replace the reference's
table-per-(pair, timeframe) Postgres sharding; Catalyst replaces the Postgres
planner; grouped pandas UDFs replace driver-side TA-Lib loops; Structured
Streaming replaces the hand-rolled asyncio websocket relay.

Everything here is built on the public Apache Spark / PySpark API only.
"""

__version__ = "0.1.0"
