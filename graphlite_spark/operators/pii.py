"""PII detection and redaction over a document corpus.

The standard pre-training hygiene pass: find emails / URLs / SSNs /
phone numbers / IPv4 addresses, count them per document, and emit the
redacted text (each match replaced by a typed sentinel token).

Dialect discipline — the patterns below are written in the common
subset of Java regex (Spark) and RE2 (DuckDB): character classes,
bounded quantifiers, alternation-free atoms, and the ASCII word
boundary ``\\b``, all of which behave identically in both engines.  No
lookarounds, no backreferences (RE2 has neither).

Semantics:

* **Counts are independent per pattern** over the ORIGINAL text — a
  token matched by two patterns counts toward both.
* **Redaction is sequential** in the fixed documented order
  URL -> EMAIL -> SSN -> PHONE -> IPV4 (URL first so a URL is replaced
  whole rather than having an embedded host fragment redacted out from
  under it).  Both engines apply the same order, so the md5 of the
  redacted text is hash-exact across engines.

Scale shape: one zero-shuffle projection — five ``regexp_count`` and
five ``regexp_replace`` calls, all inside whole-stage codegen, no UDF,
no aggregation.  At 100 TB this is scan-bound and embarrassingly
parallel; the only thing to size is the input split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered (type, pattern, sentinel).  Order is the REDACTION order and
# is part of the operator contract (see module docstring).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[A-Za-z0-9._/%-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_url, n_email, n_ssn, n_phone, n_ipv4, n_pii,
    redacted_md5) — per-document PII profile.

    ``n_<type>`` counts matches of each pattern on the original text;
    ``n_pii`` is their sum; ``redacted_md5`` is the md5 hex digest of
    the text after sequential redaction (sentinels in place of
    matches), so downstream exact-dedup keys on the redacted form."""
    cols: list[Column] = [F.col("doc_id")]
    total = F.lit(0).cast("long")
    for name, pat, _ in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    redacted = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    return docs.select(
        *cols,
        total.alias("n_pii"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


def with_contact_suffix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a deterministic PII-bearing contact line derived from
    ``doc_id`` to each document.

    The synthetic test corpus contains no digits at all, so a PII scan
    over it is the all-zero identity; this suffix gives the entry query
    real matches with per-document variance while staying a pure
    column expression both engines evaluate identically (the DuckDB
    oracle concatenates the same suffix).  Docs where
    ``doc_id % 3 == 0`` carry a second email so counts are not
    constant."""
    did = F.col("doc_id")
    s = F.concat(
        F.col(text_col),
        F.lit(" reach user"),
        did.cast("string"),
        F.lit("@example.com or https://host"),
        did.cast("string"),
        F.lit(".example/path tel 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789 ip 10."),
        (did % 200).cast("string"),
        F.lit(".0."),
        (did % 250).cast("string"),
        F.when(did % 3 == 0, F.lit(" cc admin@example.org")).otherwise(
            F.lit("")
        ),
    )
    return docs.withColumn(text_col, s)


def with_shared_contacts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a deterministic contact suffix with CROSS-document
    collisions — the entity-resolution test bed (the digit-free
    synthetic corpus shares no identifiers at all).

    * docs with ``doc_id % 3 == 0`` carry email ``user<doc_id div 6>@…``
      — ids 6k and 6k+3 share an address (pairs);
    * docs with ``doc_id % 5 == 0`` carry phone ``415-555-<doc_id div
      10 mod 10000>`` — ids 10k and 10k+5 share a number (pairs);
    * ids divisible by both 3 and 5 bridge their email-pair and
      phone-pair into a chain — real transitive-merge structure with
      bounded cluster size, plus singletons (ids carrying nothing).

    Pure column expressions mirrored verbatim by the DuckDB oracle."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" mail user"),
            F.expr("doc_id div 6").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" tel 415-555-"),
            F.lpad(F.expr("(doc_id div 10) % 10000").cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn(text_col, F.concat(F.col(text_col), email, phone))
