"""PII scan/redaction vs hand-checked strings and Python re."""

from __future__ import annotations

import re

from graphlite_spark.operators.pii import (
    PII_PATTERNS,
    pii_scan,
    with_contact_suffix,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _py_scan(text):
    counts = {
        name: len(re.findall(pat, text)) for name, pat, _ in PII_PATTERNS
    }
    red = text
    for _, pat, token in PII_PATTERNS:
        red = re.sub(pat, token, red)
    return counts, red


def test_counts_and_redaction_tricky(spark):
    texts = [
        "mail a.b+c@sub.domain.org and x@y.io now",           # two emails
        "visit https://ex.com/a_b%2F-path then stop",         # url charclass
        "ssn 123-45-6789 phone 415-555-0042 ip 10.0.0.1",     # all disjoint
        "dotted phone 415.555.0042 vs ip 1.2.3.4",            # [-.] branch
        "no pii here at all",                                  # zeros
        "999.999.999.999 still matches the ipv4 shape",       # no range check
        "http://plain.example/x and user@host.co",            # http + email
    ]
    rows = {r["doc_id"]: r for r in pii_scan(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        counts, red = _py_scan(t)
        got = rows[i]
        for name in counts:
            assert got[f"n_{name}"] == counts[name], (i, name, t)
        assert got["n_pii"] == sum(counts.values())
        import hashlib

        assert got["redacted_md5"] == hashlib.md5(red.encode()).hexdigest()


def test_redaction_order_url_swallows_host(spark):
    # the host fragment inside the URL must be gone as part of <URL>,
    # not separately replaced — order is part of the contract
    texts = ["see https://a.bc/d plus standalone a.bc@mail.org"]
    r = pii_scan(_docs(spark, texts)).collect()[0]
    assert r["n_url"] == 1 and r["n_email"] == 1
    _, red = _py_scan(texts[0])
    assert red == "see <URL> plus standalone <EMAIL>"


def test_contact_suffix_determinism_and_variance(spark):
    docs = _docs(spark, ["alpha", "beta", "gamma", "delta"])
    out = {
        r["doc_id"]: r
        for r in pii_scan(with_contact_suffix(docs)).collect()
    }
    # doc_id % 3 == 0 rows carry the extra admin email
    assert out[0]["n_email"] == 2 and out[3]["n_email"] == 2
    assert out[1]["n_email"] == 1 and out[2]["n_email"] == 1
    for r in out.values():
        assert r["n_url"] == 1 and r["n_ssn"] == 1
        assert r["n_phone"] == 1 and r["n_ipv4"] == 1
    # identical input -> identical digest (pure column expression)
    again = {
        r["doc_id"]: r["redacted_md5"]
        for r in pii_scan(with_contact_suffix(docs)).collect()
    }
    assert again == {k: v["redacted_md5"] for k, v in out.items()}
