"""JDBC wrapper contract tests — option plumbing and the parallelism
contract, with the provider chain mocked (no live database in the sandbox;
the reference's Postgres path is src/database/base.py:8-26)."""

from unittest.mock import MagicMock

import pytest

from trading_etl_spark.sources.jdbc import read_jdbc, write_jdbc


def _reader_mock():
    reader = MagicMock(name="reader")
    reader.format.return_value = reader
    reader.option.return_value = reader
    reader.load.return_value = "DF"
    return reader


def _opts(mock) -> dict[str, str]:
    return {c.args[0]: c.args[1] for c in mock.option.call_args_list}


def test_read_jdbc_partitioned_scan_options():
    spark = MagicMock()
    spark.read = _reader_mock()
    spark.conf.get.return_value = "32"
    out = read_jdbc(
        spark,
        "jdbc:postgresql://db/trading",
        "fact_sma",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
    )
    assert out == "DF"
    opts = _opts(spark.read)
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"  # defaults to shuffle partitions
    assert opts["fetchsize"] == "10000"
    assert opts["dbtable"] == "fact_sma"


def test_read_jdbc_rejects_partial_partitioning():
    spark = MagicMock()
    spark.read = _reader_mock()
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:postgresql://db/t", "t", partition_column="id")


def test_read_jdbc_single_task_for_dims():
    spark = MagicMock()
    spark.read = _reader_mock()
    read_jdbc(spark, "jdbc:postgresql://db/t", "dim_currency")
    assert "partitionColumn" not in _opts(spark.read)


def test_write_jdbc_batched_append():
    df = MagicMock()
    writer = MagicMock(name="writer")
    df.write.format.return_value = writer
    writer.option.return_value = writer
    writer.mode.return_value = writer
    write_jdbc(df, "jdbc:postgresql://db/t", "ohlc_1m", properties={"user": "etl"})
    opts = _opts(writer)
    assert opts["batchsize"] == "10000"
    assert opts["truncate"] == "false"
    assert opts["user"] == "etl"
    writer.mode.assert_called_once_with("append")
    writer.save.assert_called_once()
