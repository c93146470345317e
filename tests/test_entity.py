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


def test_edit_distance_join_hand(spark):
    from graphlite_spark.operators.dedup import edit_distance_join

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base.replace("quick", "qvack")),          # dist 2
        (3, base + " tail"),                          # dist 5 from 1
        (4, "completely different text with nothing shared at all ok"),
        (5, base),                                    # dist 0 from 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in edit_distance_join(docs, k=5).collect()
    }
    assert got[(1, 2)] == 2 and got[(1, 5)] == 0 and got[(1, 3)] == 5
    assert got[(2, 5)] == 2 and got[(3, 5)] == 5
    # 2-3: quick->quack (2) plus " tail" (5) = 7 > k; 4 pairs with nobody
    assert (2, 3) not in got
    assert not any(4 in p for p in got)


def test_edit_distance_join_short_string_guard(spark):
    import pytest

    from graphlite_spark.operators.dedup import edit_distance_join

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="shorter than q"):
        edit_distance_join(docs, k=2)
