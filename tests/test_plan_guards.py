"""Plan-shape guards over the entry queries.

A cartesian product sneaking into a join-shaped query is the classic
silent 100 TB killer — it's correct at sf0.001 and unrunnable at scale.
This meta-test plans (without executing) every join-shaped entry query
and asserts no CartesianProduct anywhere, and BroadcastNestedLoopJoin
only where it is the DOCUMENTED brute-force baseline.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# queries whose DataFrame construction is lazy and whose plan contains
# joins where a cartesian could hide
GUARDED = [
    "msg_gather_ss1",
    "out_degrees",
    "degree_histogram",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_filtered",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_lsh_topk",
    "ann_cosine_topk",
    "ann_lsh_recall",
    "adamic_adar",
    "avg_neighbor_degree",
    "token_cooccurrence",
    "tf_idf",
    "tfidf_cosine_pairs",
    "triangles_total",
    "triangles_per_vertex",
    "clustering_coefficient",
    "degree_assortativity",
    "modularity_conv",
    "events_asof",
    "events_range_join",
    "events_quantiles",
    "events_sessionize",
    "events_windowed",
    "events_windowed_sliding",
    "pack_documents",
    "sample_stratified",
    "kmv_distinct_users",
    # loop queries checkpoint per round (plan truncation), so only the
    # FINAL join shape is visible here — ktruss's membership join and
    # bloom's literal-bitmap filter + stats joins; mis/coloring/anf end
    # in a checkpoint scan with nothing left to guard
    "ktruss_3",
    "bloom_semijoin",
    "rectangles_total",
    "role_assortativity",
    "quantile_buckets",
    "bigram_next_topk",
    "heavy_hitters_users",
    "louvain_refine_lpa3",
    # round-4 additions: the CMS probe join and the temporal-reach
    # relaxation joins (equality on src + t>=arr residual — must stay a
    # hash join); bpe_merges/mix_corpus have no data-data join to guard
    "cms_heavy_hitters",
    "temporal_reach",
    # round-4 late additions: reciprocity's swapped-key self-join must
    # stay an equi hash join; rich_club / effective_diameter join a
    # literal-sized broadcast side (k-list / 1-row NF max) by design
    "reciprocity_contacts",
    "rich_club",
    "effective_diameter",
]

# brute-force baselines DOCUMENTED as broadcast nested-loop scans: the
# exact cosine top-k (and the recall query that embeds it as ground
# truth); every other query must stay equi-join/hashable
BNLJ_ALLOWED = {
    "ann_cosine_topk",
    "ann_lsh_recall",
    # tiny-literal broadcast sides (4-row k-list / 1-row NF(max)):
    # the nested-loop side is constant-sized, never data-sized
    "rich_club",
    "effective_diameter",
}


@pytest.mark.parametrize("name", GUARDED)
def test_no_cartesian_in_plan(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: {plan[:800]}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: {plan[:800]}"
