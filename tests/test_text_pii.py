"""PII scrubbing semantics on planted fixtures (the synthetic corpus carries
no real PII, so the oracle check alone would only prove the zero case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgy_spark.functions.textprep import PII_EMAIL, PII_IPV4, PII_PHONE, scrub_pii  # noqa: F401


def test_scrub_pii_redacts_planted_values(spark):
    rows = [
        (1, "contact alice.smith+spam@ex-ample.org for details"),
        (2, "server at 192.168.0.17 answered"),
        (3, "call 555-867-5309 or 555.867.5310 today"),
        (4, "mixed: bob@corp.io from 10.0.0.1 dialed 123-456-7890"),
        (5, "clean text with numbers 12345 and 1.5 remains untouched"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["scrubbed"]
        for r in df.select("doc_id", scrub_pii(F.col("text")).alias("scrubbed")).collect()
    }
    assert got[1] == "contact [EMAIL] for details"
    assert got[2] == "server at [IP] answered"
    assert got[3] == "call [PHONE] or [PHONE] today"
    assert got[4] == "mixed: [EMAIL] from [IP] dialed [PHONE]"
    assert got[5] == rows[4][1]


def test_scrub_order_email_before_phone(spark):
    """An address containing digit runs must be redacted as ONE email, not
    partially eaten by the phone/IP patterns."""
    df = spark.createDataFrame(
        [(1, "reach 123.456.7890@numbers.example.com now")],
        "doc_id long, text string",
    )
    out = df.select(scrub_pii(F.col("text")).alias("s")).collect()[0]["s"]
    assert out == "reach [EMAIL] now"
