"""Bow-tie decomposition vs hand-classified graphs covering all six
classes, plus the empty-IN short-circuit path."""

from __future__ import annotations

from graphlite_spark.algos.bowtie import bowtie_decomposition


def _run(spark, vertices, edges):
    v = spark.createDataFrame([(i,) for i in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["cls"]
        for r in bowtie_decomposition(v, e, num_partitions=4).collect()
    }


def test_bowtie_all_six_classes(spark):
    # core cycle 10-11-12; IN chain 0->1->core; OUT chain core->20->21;
    # TUBE 30 (IN->30->OUT, never touching core); TENDRILs: 40/42 hang
    # off IN going nowhere, 41 feeds OUT from nowhere; 50/51 a separate
    # weak component.
    vertices = [0, 1, 10, 11, 12, 20, 21, 30, 40, 41, 42, 50, 51]
    edges = [
        (10, 11), (11, 12), (12, 10),
        (1, 10), (0, 1),
        (12, 20), (20, 21),
        (1, 30), (30, 20),
        (1, 40), (40, 42), (41, 20),
        (50, 51),
    ]
    got = _run(spark, vertices, edges)
    assert got == {
        10: "CORE", 11: "CORE", 12: "CORE",
        0: "IN", 1: "IN",
        20: "OUT", 21: "OUT",
        30: "TUBE",
        40: "TENDRIL", 41: "TENDRIL", 42: "TENDRIL",
        50: "DISCONNECTED", 51: "DISCONNECTED",
    }


def test_bowtie_empty_in_set(spark):
    # the core is a source component: IN empty (the fin fixpoint must
    # short-circuit), OUT populated, everything else disconnected
    got = _run(spark, [0, 1, 2, 9], [(0, 1), (1, 0), (1, 2)])
    assert got == {0: "CORE", 1: "CORE", 2: "OUT", 9: "DISCONNECTED"}


def test_bowtie_core_tie_breaks_to_min_label(spark):
    # two SCCs of equal size: {0,1} and {5,6} — the core is the one with
    # the smaller min label; the other is a separate weak component
    got = _run(spark, [0, 1, 5, 6], [(0, 1), (1, 0), (5, 6), (6, 5)])
    assert got == {
        0: "CORE", 1: "CORE", 5: "DISCONNECTED", 6: "DISCONNECTED",
    }
