"""REST gateway (gateway.py): the reference client's wire protocol served
over the in-process engine — session open, statement submit, status poll,
token-paged result fetch with nextResultUri, cancel, session close."""

from __future__ import annotations

import json
import urllib.request

import pytest

from flink_notebooks_spark.gateway import serve


@pytest.fixture()
def gw(spark):
    server, gateway = serve(spark)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()


def call(method: str, url: str, payload: dict | None = None) -> dict:
    req = urllib.request.Request(url, method=method)
    data = None
    if payload is not None:
        data = json.dumps(payload).encode()
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, data) as resp:
        return json.loads(resp.read())


def test_full_protocol_roundtrip(gw):
    # health check (reference SETUP.md:120 curls /v1/info)
    info = call("GET", f"{gw}/v1/info")
    assert info["productName"] == "flink-notebooks-spark"

    # session with properties (sqlGatewayClient.ts:71-85)
    s = call("POST", f"{gw}/v1/sessions",
             {"properties": {"execution.runtime-mode": "batch"}})
    h = s["sessionHandle"]

    # the smoke statement (SETUP.md:76)
    op = call("POST", f"{gw}/v1/sessions/{h}/statements",
              {"statement": "SELECT 1 as id, 'Hello Flink!' as message"})[
        "operationHandle"
    ]
    status = call("GET", f"{gw}/v1/sessions/{h}/operations/{op}/status")
    assert status["status"] in ("RUNNING", "FINISHED")

    page = call("GET", f"{gw}/v1/sessions/{h}/operations/{op}/result/0?rowFormat=JSON")
    assert page["resultType"] == "PAYLOAD"
    assert [c["name"] for c in page["results"]["columns"]] == ["id", "message"]
    assert page["results"]["data"] == [{"kind": "INSERT", "fields": [1, "Hello Flink!"]}]
    nxt = page["nextResultUri"]
    assert call("GET", f"{gw}{nxt}")["resultType"] == "EOS"

    call("DELETE", f"{gw}/v1/sessions/{h}")


def test_ddl_and_paged_fetch(gw):
    h = call("POST", f"{gw}/v1/sessions",
             {"properties": {"execution.runtime-mode": "batch"}})["sessionHandle"]

    def run(sql):
        return call("POST", f"{gw}/v1/sessions/{h}/statements", {"statement": sql})[
            "operationHandle"
        ]

    run(
        "CREATE TABLE gw_t (id INT) WITH ('connector'='datagen',"
        "'number-of-rows'='250','fields.id.kind'='sequence',"
        "'fields.id.start'='1','fields.id.end'='250')"
    )
    op = run("SELECT id FROM gw_t ORDER BY id")
    rows, url, pages = [], f"{gw}/v1/sessions/{h}/operations/{op}/result/0", 0
    while pages < 10:
        page = call("GET", url)
        if page["resultType"] == "EOS":
            break
        rows.extend(page["results"]["data"])
        url = f"{gw}{page['nextResultUri']}"
        pages += 1
    assert [r["fields"][0] for r in rows] == list(range(1, 251))
    assert pages == 3  # 100-row pages (reference sqlGatewayClient.ts:128)


def test_errors_and_cancel(gw):
    h = call("POST", f"{gw}/v1/sessions", {})["sessionHandle"]
    # unknown operation → 404 with errors list
    with pytest.raises(urllib.error.HTTPError) as e:
        call("GET", f"{gw}/v1/sessions/{h}/operations/deadbeef/status")
    assert e.value.code == 404
    # bad SQL → 500 with errors list
    with pytest.raises(urllib.error.HTTPError) as e:
        call("POST", f"{gw}/v1/sessions/{h}/statements",
             {"statement": "SELECT FROM WHERE"})
    assert e.value.code == 500
    assert "errors" in json.loads(e.value.read())

    op = call("POST", f"{gw}/v1/sessions/{h}/statements",
              {"statement": "SELECT 1 AS x"})["operationHandle"]
    assert call("DELETE", f"{gw}/v1/sessions/{h}/operations/{op}")["status"] == "CANCELED"
    assert call("GET", f"{gw}/v1/sessions/{h}/operations/{op}/status")["status"] == "CANCELED"


def test_streaming_statement_over_rest(gw):
    """Unbounded SELECT through the wire: NOT_READY retries the SAME token
    (reference flinkNotebookController.ts:179-235), rows stream in pages,
    DELETE cancels the operation."""
    import time

    h = call("POST", f"{gw}/v1/sessions", {})["sessionHandle"]  # streaming mode
    call("POST", f"{gw}/v1/sessions/{h}/statements", {
        "statement": (
            "CREATE TABLE gw_clicks (user_id INT, event_time TIMESTAMP(3), "
            "WATERMARK FOR event_time AS event_time - INTERVAL '5' SECOND) "
            "WITH ('connector'='datagen','rows-per-second'='100',"
            "'fields.user_id.min'='1','fields.user_id.max'='9')"
        )
    })
    op = call("POST", f"{gw}/v1/sessions/{h}/statements",
              {"statement": "SELECT user_id FROM gw_clicks"})["operationHandle"]
    rows, url, t0 = [], f"{gw}/v1/sessions/{h}/operations/{op}/result/0", time.time()
    while len(rows) < 5 and time.time() - t0 < 60:
        page = call("GET", url)
        if page["resultType"] == "PAYLOAD":
            rows.extend(page["results"]["data"])
            url = f"{gw}{page['nextResultUri']}"
        elif page["resultType"] == "NOT_READY":
            assert page["nextResultUri"].endswith(url.rsplit("/", 1)[-1])  # same token
            time.sleep(0.5)
        else:
            break
    assert len(rows) >= 5
    assert all(1 <= r["fields"][0] <= 9 for r in rows)
    assert call("DELETE", f"{gw}/v1/sessions/{h}/operations/{op}")["status"] == "CANCELED"
    call("DELETE", f"{gw}/v1/sessions/{h}")


def test_sessions_are_isolated_over_rest(gw):
    """Two sessions share the cluster but not table registries — the
    reference's session model (sqlGatewayClient.ts:71-95)."""
    h1 = call("POST", f"{gw}/v1/sessions",
              {"properties": {"execution.runtime-mode": "batch"}})["sessionHandle"]
    h2 = call("POST", f"{gw}/v1/sessions",
              {"properties": {"execution.runtime-mode": "batch"}})["sessionHandle"]
    call("POST", f"{gw}/v1/sessions/{h1}/statements", {
        "statement": "CREATE TABLE iso_t (id INT) WITH ('connector'='datagen',"
        "'number-of-rows'='1','fields.id.kind'='sequence',"
        "'fields.id.start'='1','fields.id.end'='1')"
    })
    op = call("POST", f"{gw}/v1/sessions/{h2}/statements",
              {"statement": "SHOW TABLES"})["operationHandle"]
    page = call("GET", f"{gw}/v1/sessions/{h2}/operations/{op}/result/0")
    names = [r["fields"][0] for r in page["results"]["data"]]
    assert "iso_t" not in names  # session 2 does not see session 1's table
    call("DELETE", f"{gw}/v1/sessions/{h1}")
    call("DELETE", f"{gw}/v1/sessions/{h2}")
