"""PII scrub: planted fixtures pin the match path (the driver corpus has no
PII, so the registered query only proves the no-match path); the DuckDB twin
runs the IDENTICAL patterns so engine regex parity is pinned too."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from data_pipeline__s3_to_postgres_s3_spark.operators.pii import (
    PII_PATTERNS,
    count_exprs,
    scrub_expr,
)

DOCS = [
    (0, "contact jane.doe+spam@example.co.uk for details"),
    (1, "server at 10.0.255.3 timed out, retry 192.168.1.1"),
    (2, "call +1 (555) 123-4567 or 555 867 5309 now"),
    (3, "mixed: bob@corp.io from 172.16.0.9 dialed 020-7946-0958"),
    (4, "no pii here, just words and the number 7"),
    (5, ""),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    text = F.col("text")
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", scrub_expr(text).alias("clean"), *count_exprs(text)
        ).collect()
    }


def test_email_scrubbed(scrubbed):
    assert scrubbed[0]["clean"] == "contact <EMAIL> for details"
    assert scrubbed[0]["n_email"] == 1


def test_ipv4_scrubbed(scrubbed):
    assert scrubbed[1]["clean"] == "server at <IP> timed out, retry <IP>"
    assert scrubbed[1]["n_ip"] == 2


def test_phones_scrubbed(scrubbed):
    assert scrubbed[2]["clean"] == "call <PHONE> or <PHONE> now"
    assert scrubbed[2]["n_phone"] == 2


def test_mixed_categories(scrubbed):
    r = scrubbed[3]
    assert r["clean"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1)


def test_clean_doc_untouched(scrubbed):
    assert scrubbed[4]["clean"] == DOCS[4][1]
    assert scrubbed[5]["clean"] == ""
    assert all(
        scrubbed[i][f"n_{name}"] == 0
        for i in (4, 5)
        for name, _, _ in PII_PATTERNS
    )


def test_duckdb_regex_parity(scrubbed):
    """RE2 applying the same patterns produces the same scrub + counts."""
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    clean = "text"
    for _, pattern, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pattern}', '{token}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pattern}')) AS n_{name}"
        for name, pattern, _ in PII_PATTERNS
    )
    for doc_id, c, ne, ni, np_ in con.execute(
        f"SELECT doc_id, {clean}, {counts} FROM docs ORDER BY doc_id"
    ).fetchall():
        r = scrubbed[doc_id]
        assert c == r["clean"], f"doc {doc_id}"
        assert (ne, ni, np_) == (r["n_email"], r["n_ip"], r["n_phone"])
