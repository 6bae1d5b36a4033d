"""JDBC connector end-to-end against the embedded Derby database that ships
with Spark (no external service): engine DDL → INSERT INTO → read-back →
partitioned scan → streaming lookup join. This is the real Spark JDBC
source/sink code path (reference CONNECTORS.md:113-121,144-152); a
Postgres/MySQL deployment only changes url/driver options."""

from __future__ import annotations

import time

import pytest

from flink_notebooks_spark.engine import Engine

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def engine(spark):
    eng = Engine(spark)
    yield eng
    eng.close()


def drain(stmt, max_pages=200):
    rows, token = [], 0
    for _ in range(max_pages):
        page = stmt.fetch(token)
        if page.result_type == "EOS":
            break
        rows.extend(page.data)
        token = page.next_token if page.next_token is not None else token
    return rows


def test_jdbc_roundtrip_and_partitioned_scan(engine, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    engine.execute_sql("SET 'execution.runtime-mode' = 'batch'")
    engine.execute_sql(
        """CREATE TABLE j_src (id INT, v DOUBLE) WITH ('connector'='datagen',
           'number-of-rows'='20','fields.id.kind'='sequence',
           'fields.id.start'='1','fields.id.end'='20')"""
    )
    engine.execute_sql(
        f"""CREATE TABLE j_tbl (id INT, v DOUBLE) WITH ('connector'='jdbc',
            'url'='{url}', 'table-name'='T_ROUND', 'driver'='{DRIVER}')"""
    )
    engine.execute_sql("INSERT OVERWRITE j_tbl SELECT id, v FROM j_src")
    rows = drain(engine.execute_sql("SELECT id FROM j_tbl ORDER BY id"))
    assert [r["fields"][0] for r in rows] == list(range(1, 21))
    # append semantics
    engine.execute_sql("INSERT INTO j_tbl SELECT id + 100, v FROM j_src WHERE id <= 2")
    rows = drain(engine.execute_sql("SELECT COUNT(*) AS c FROM j_tbl"))
    assert rows[0]["fields"][0] == 22

    # partitioned parallel scan (scan.partition.* → Spark partitionColumn)
    engine.execute_sql(
        f"""CREATE TABLE j_part (id INT, v DOUBLE) WITH ('connector'='jdbc',
            'url'='{url}', 'table-name'='T_ROUND', 'driver'='{DRIVER}',
            'scan.partition.column'='id', 'scan.partition.num'='4',
            'scan.partition.lower-bound'='1', 'scan.partition.upper-bound'='200')"""
    )
    from flink_notebooks_spark.sources import jdbc as jdbc_src

    df = jdbc_src.build_batch(engine.spark, engine.tables["j_part"])
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 22


def test_jdbc_lookup_join_from_stream(engine, tmp_path):
    """Streaming query joining an unbounded stream against a JDBC dimension
    — Flink's JDBC lookup join (CONNECTORS.md:113-121)."""
    url = f"jdbc:derby:{tmp_path}/dim;create=true"
    engine.execute_sql("SET 'execution.runtime-mode' = 'batch'")
    engine.execute_sql(
        """CREATE TABLE dim_src (id INT, name STRING) WITH ('connector'='datagen',
           'number-of-rows'='9','fields.id.kind'='sequence',
           'fields.id.start'='1','fields.id.end'='9')"""
    )
    engine.execute_sql(
        f"""CREATE TABLE j_dim (id INT, name STRING) WITH ('connector'='jdbc',
            'url'='{url}', 'table-name'='DIM', 'driver'='{DRIVER}')"""
    )
    engine.execute_sql("INSERT OVERWRITE j_dim SELECT id, concat('n', cast(id as string)) FROM dim_src")
    engine.execute_sql("SET 'execution.runtime-mode' = 'streaming'")
    engine.execute_sql(
        """CREATE TABLE clicks (user_id INT) WITH ('connector'='datagen',
           'rows-per-second'='100','fields.user_id.min'='1','fields.user_id.max'='9')"""
    )
    stmt = engine.execute_sql(
        "SELECT c.user_id, d.name FROM clicks c JOIN j_dim d ON d.id = c.user_id"
    )
    rows, t0 = [], time.time()
    while len(rows) < 5 and time.time() - t0 < 60:
        rows = drain(stmt, max_pages=1)
        time.sleep(0.5)
    stmt.cancel()
    assert len(rows) >= 5
    assert all(r["fields"][1] == f"n{r['fields'][0]}" for r in rows)


def test_cdc_connector_snapshot_over_derby(engine, tmp_path):
    """The reference's postgres-cdc table shape (CONNECTORS.md:124-140):
    batch reads of a CDC-declared table are the current snapshot; a change
    in the database shows up on the next view refresh. Derby stands in for
    Postgres via the url/driver overrides (same JDBC reader)."""
    url = f"jdbc:derby:{tmp_path}/cdcdb;create=true"
    engine.execute_sql("SET 'execution.runtime-mode' = 'batch'")
    engine.execute_sql(
        f"""CREATE TABLE seedtbl (id INT, name STRING) WITH ('connector'='jdbc',
            'url'='{url}', 'table-name'='USERS', 'driver'='{DRIVER}')"""
    )
    engine.execute_sql(
        "INSERT OVERWRITE seedtbl SELECT * FROM VALUES (1,'ada'), (2,'bob') AS t(id, name)"
    )
    engine.execute_sql(
        f"""CREATE TABLE users_cdc (
              id INT, name STRING, PRIMARY KEY (id) NOT ENFORCED
            ) WITH ('connector'='postgres-cdc', 'url'='{url}',
                    'schema-name'='APP', 'table-name'='USERS', 'driver'='{DRIVER}')"""
    )
    rows = drain(engine.execute_sql("SELECT id, name FROM users_cdc ORDER BY id"))
    assert [r["fields"] for r in rows] == [[1, "ada"], [2, "bob"]]

    # database changes → next refresh sees the new state
    engine.execute_sql("INSERT INTO seedtbl SELECT * FROM VALUES (3,'eve') AS t(id, name)")
    rows = drain(engine.execute_sql("SELECT id, name FROM users_cdc ORDER BY id"))
    assert [r["fields"] for r in rows] == [[1, "ada"], [2, "bob"], [3, "eve"]]


def test_cdc_connector_requires_primary_key(engine, tmp_path):
    engine.execute_sql("SET 'execution.runtime-mode' = 'batch'")
    with pytest.raises(Exception, match="PRIMARY KEY"):
        engine.execute_sql(
            f"""CREATE TABLE nopk_cdc (id INT) WITH ('connector'='postgres-cdc',
                'url'='jdbc:derby:{tmp_path}/x;create=true', 'table-name'='T',
                'driver'='{DRIVER}')"""
        )
