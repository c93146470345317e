"""Entity resolution: hand clusters, stop-identifier cap, extraction."""

from __future__ import annotations

from graphlite_spark.operators.entity import (
    entity_resolution,
    extract_identifiers,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extract_identifiers_typed_lower(spark):
    docs = _docs(spark, [(1, "mail Bob@Example.COM tel 415-555-0001 x")])
    got = {r["ident"] for r in extract_identifiers(docs).collect()}
    assert got == {"email:bob@example.com", "phone:415-555-0001"}


def test_entity_resolution_hand(spark):
    # 1-2 share an email; 2-3 share a phone (transitive merge);
    # 4-5 share an email; 6 has identifiers matching nobody; 7 has none
    docs = _docs(
        spark,
        [
            (1, "a@x.com says hi"),
            (2, "reach a@x.com or 415-555-1111"),
            (3, "tel 415-555-1111 end"),
            (4, "b@y.org"),
            (5, "also b@y.org"),
            (6, "c@z.net 415-555-9999"),
            (7, "no contacts here"),
        ],
    )
    got = {r["doc_id"]: r["entity"] for r in entity_resolution(docs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_entity_resolution_stop_identifier_cap(spark):
    # info@org.com appears in every doc — with max_df=3 it is a
    # stop-identifier and must create NO edges; the discriminating
    # email still pairs 1-2
    rows = [(i, f"info@org.com {'x@p.io' if i in (1, 2) else 'solo'}")
            for i in range(1, 6)]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: r["entity"]
        for r in entity_resolution(docs, max_df=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}
