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


def test_cms_estimates_dominate_exact_counts(spark, sf_dir):
    """Count-min contract: estimates never undercount, and overshoot stays
    within the Markov bound for the min over CMS_D rows (deterministic for
    a fixed corpus — this is a regression pin, not a probabilistic check).
    The absent probe word's estimate is pure collision mass."""
    from pyspark.sql import functions as F

    from flink_notebooks_spark.io import load_table
    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.corpus import CMS_PROBES, CMS_W
    from flink_notebooks_spark.queries.llm import WORDS

    est = {
        r["word"]: r["est_count"]
        for r in QUERIES["token_freq_sketch"](spark, sf_dir).collect()
    }
    assert set(est) == set(CMS_PROBES)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.expr(WORDS)).alias("word"))
    n_total = tok.count()
    exact = {
        r["word"]: r["n"]
        for r in tok.groupBy("word").agg(F.count("*").alias("n")).collect()
    }
    bound = max(1, (8 * n_total) // CMS_W)
    for w in CMS_PROBES:
        true = exact.get(w, 0)
        assert est[w] >= true, (w, est[w], true)
        assert est[w] - true <= bound, (w, est[w], true, bound)
    assert exact.get("zzz_absent", 0) == 0  # the planted absent word
