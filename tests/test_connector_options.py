"""Kafka/JDBC adapters: Flink option → Spark option mapping (no broker or
database exists in this environment, so these pin the translation layer)."""

from __future__ import annotations

from flink_notebooks_spark.engine.ddl import parse_statement
from flink_notebooks_spark.sources import jdbc, kafka


def _table(ddl: str):
    return parse_statement(ddl).table


def test_kafka_option_mapping():
    t = _table(
        """
        CREATE TABLE clicks (user_id INT, url STRING) WITH (
          'connector' = 'kafka',
          'topic' = 'clicks-topic',
          'properties.bootstrap.servers' = 'broker:9092',
          'scan.startup.mode' = 'earliest-offset',
          'format' = 'json'
        )
        """
    )
    opts = kafka._common(t)  # noqa: SLF001
    assert opts["subscribe"] == "clicks-topic"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["startingOffsets"] == "earliest"


def test_kafka_defaults_topic_to_table_name():
    t = _table("CREATE TABLE events_k (a INT) WITH ('connector'='kafka')")
    assert kafka._common(t)["subscribe"] == "events_k"  # noqa: SLF001


def test_jdbc_option_mapping_with_partitioned_scan():
    t = _table(
        """
        CREATE TABLE pg_orders (o_id BIGINT, amount DOUBLE) WITH (
          'connector' = 'jdbc',
          'url' = 'jdbc:postgresql://db:5432/shop',
          'table-name' = 'public.orders',
          'username' = 'u',
          'password' = 'p',
          'scan.partition.column' = 'o_id',
          'scan.partition.num' = '8',
          'scan.partition.lower-bound' = '1',
          'scan.partition.upper-bound' = '1000'
        )
        """
    )
    opts = jdbc.reader_options(t)
    assert opts["url"].startswith("jdbc:postgresql")
    assert opts["dbtable"] == "public.orders"
    assert opts["user"] == "u"
    # the parallel-scan path: 8 partition splits over o_id ∈ [1, 1000]
    assert (opts["partitionColumn"], opts["numPartitions"]) == ("o_id", "8")
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000")


def test_strip_comments_preserves_literals():
    """Comment markers inside quoted strings are data, not comments
    (hypothesis-found: an option value '--' vanished)."""
    from flink_notebooks_spark.engine.ddl import strip_comments

    assert strip_comments("SELECT '--' AS a -- trailing\n, '/*x*/' AS b") == (
        "SELECT '--' AS a  \n, '/*x*/' AS b"
    )
    assert strip_comments("'it''s -- fine' /* gone */;") == "'it''s -- fine'"
