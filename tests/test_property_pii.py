"""Cross-engine fuzz: the PII scrub's Java-regex (Spark) and RE2
(DuckDB oracle) executions must agree on arbitrary text, not just the
planted registry corpus. The pattern family is deliberately written in
the Java/RE2-common subset; this differential is the net that catches a
pattern edit drifting outside it (lookaround, unicode classes,
alternation-order traps).

Fragments mix true positives with near-misses (too many digits, word
chars butting against \\b, multi-dot quads) plus random filler.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from barks_ocr_spark.operators import textstats

_FRAGMENTS = [
    "user@example.com",
    "a.b+c@ex-ample.co.uk",
    "not-an-email@",
    "@nope",
    "u..v@w..x",
    "555-1234",
    "x555-1234",
    "555-12345",
    "555-123-4567",
    "(202) 555-0147",
    "(202)555-0147",
    "555.867.5309",
    "12 555 123 4567 99",
    "123-45-6789",
    "123-456-789",
    "1234-56-7890",
    "10.0.0.1",
    "1.2.3.4.5",
    "999.999.999.999",
    "1.2.3",
    "version1.2.3.4x",
    "plain words",
    "trailing dot.",
    "comma, here",
]


def _pii_sql() -> str:
    prev = "t0"
    reps = []
    counts = []
    for i, (cname, pat, token) in enumerate(textstats._PII_STAGES):
        counts.append(
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS {cname}"
        )
        cur = f"t{i + 1}"
        reps.append(
            f"regexp_replace({prev}, '{pat}', '{token}', 'g') AS {cur}"
        )
        prev = cur
    # build nested selects so each stage sees the previous redaction
    inner = "SELECT rid, text AS t0 FROM rows"
    for i, rep in enumerate(reps):
        inner = f"SELECT *, {rep} FROM ({inner})"
    return f"SELECT rid, t{len(reps)} AS text_redacted, {', '.join(counts)} FROM ({inner})"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(_FRAGMENTS)
            | st.text(alphabet="ab9 .-()@", max_size=12),
            min_size=0,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_pii_redact_spark_matches_duckdb(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["text_redacted"],
            r["n_emails"],
            r["n_phones"],
            r["n_ssn"],
            r["n_ipv4"],
        )
        for r in textstats.pii_redact(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE rows (rid BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO rows VALUES (?, ?)", rows)
    want = {
        rid: tuple(rest) for rid, *rest in con.sql(_pii_sql()).fetchall()
    }
    con.close()
    assert got == want
