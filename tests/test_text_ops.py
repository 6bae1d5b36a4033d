"""PII scrubbing (operators/text.py): redaction + audit counts stay JVM-side."""

from __future__ import annotations

import pytest

from flink_notebooks_spark.operators.text import scrub_pii


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "contact alice.smith+spam@example.co.uk for details"),
        (2, "server at 192.168.0.1 responded; backup 10.0.0.255 did not"),
        (3, "call +1 (555) 123-4567 or 555-987-6543 today"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "clean text with no identifiers at all"),
        (6, "mixed: bob@corp.io from 8.8.8.8 dialed +44 20 7946 0958"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_scrub_replaces_each_kind(docs):
    out = {r["id"]: r["text"] for r in scrub_pii(docs, "text").collect()}
    assert out[1] == "contact <EMAIL> for details"
    assert out[2] == "server at <IP> responded; backup <IP> did not"
    assert out[3] == "call <PHONE> or <PHONE> today"
    assert out[4] == "ssn <SSN> leaked"
    assert out[5] == "clean text with no identifiers at all"
    assert out[6] == "mixed: <EMAIL> from <IP> dialed <PHONE>"


def test_audit_counts(docs):
    r = {
        row["id"]: (row["n_pii_email"], row["n_pii_ipv4"], row["n_pii_phone"])
        for row in scrub_pii(docs, "text").collect()
    }
    assert r[1][0] == 1 and r[2][1] == 2 and r[3][2] == 2
    assert r[5] == (0, 0, 0)


def test_email_domain_not_eaten_as_ip(spark):
    # ordering regression: user@1.2.3.4-style text must scrub as one email
    df = spark.createDataFrame([(1, "x user@mail.example.com y")], "id int, text string")
    out = scrub_pii(df, "text").collect()[0]["text"]
    assert out == "x <EMAIL> y"


def test_plan_stays_jvm_side(docs):
    plan = scrub_pii(docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unknown_kind_rejected(docs):
    with pytest.raises(ValueError):
        scrub_pii(docs, "text", kinds=("email", "dna"))
