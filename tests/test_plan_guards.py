"""Plan-shape guards over the entry queries.

A cartesian product sneaking into a join-shaped query is the classic
silent 100 TB killer — it's correct at sf0.001 and unrunnable at scale.
This meta-test plans (without executing) every join-shaped entry query
and asserts no CartesianProduct anywhere, and BroadcastNestedLoopJoin
only where it is the DOCUMENTED brute-force baseline.
"""

from __future__ import annotations

import re

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
    "triad_census",
    # round-5 additions: SNM's rank join + candidate verify, the dyad
    # bitmask join, the transition-total broadcast join
    "dedup_sorted_neighborhood",
    "dyad_census",
    "tool_transitions",
    "eigenvector_6iter",
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
    # round-5 additions: the quotient-graph label joins and the snapshot
    # churn (whose only non-equi join is the 1-row midpoint broadcast);
    # Q6 is join-free but must never degrade to anything but a scan+agg
    "graph_contract_lpa3",
    "contact_graph_delta",
    "tpch_q6_forecast",
    # round-5 late wave: the identifier star join (entity resolution
    # ends in the CC engine's checkpoint scan, so guard the extraction
    # join via the idents/star path inside; what's visible is the final
    # label join) and the TPC-H join pyramid — semi (Q4), two-sided
    # dimension (Q7), top-n (Q10), outer histogram (Q13), fact-dim
    # ratio (Q14), max-broadcast-back (Q15), having rollup (Q18).
    # lin_centrality_msbfs / betweenness_sampled6 run their engines
    # eagerly and end in checkpoint scans — nothing left to guard here
    # (their shapes are asserted in their own modules' docstrings and
    # exercised by the oracle parity).
    "entity_resolution",
    "tpch_q4_late_orders",
    "tpch_q7_nation_volume",
    "tpch_q10_returns",
    "tpch_q13_order_dist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    # ED-Join: prefix-gram equi-join + candidate-only levenshtein
    "edit_distance_join",
    # round-5 continuation: the rest of the expressible TPC-H tier —
    # snowflake share (Q8), correlated-avg rewrite (Q17), disjunctive
    # predicate hull (Q19 — the OR must NOT reach the join condition),
    # double-EXISTS grouped rewrite (Q21), scalar-avg + anti-join (Q22)
    "tpch_q8_market_share",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting",
    "tpch_q22_dormant",
    # derived-partsupp tier (Q2/Q9/Q11/Q16/Q20 + the base table + Q12)
    "tpch_partsupp_derived",
    "tpch_q2_min_cost_supp",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_counts",
    "tpch_q16_supplier_counts",
    "tpch_q20_excess_stock",
    # column profiler (melt + one groupBy, no Expand) and the KMV pair
    # overlap (sketch-row joins only); kcenter/conv_structure run their
    # engines eagerly — nothing left to guard (the lin/betweenness rule)
    "profile_events",
    "kmv_audience_overlap",
    "behavior_correlations",
    "negative_sampling_3",
    # behavioral/engagement readouts (gini and kcenter/conv_structure
    # run eagerly — nothing left to guard there)
    "dataset_split",
    "activity_trend",
    "dau_wau_stickiness",
    "user_type_entropy",
    "text_ttr",
    "tool_cooccurrence_pmi",
    "user_burstiness",
    "edge_support",
    "conv_dedup_minhash",
    "hll_audience_overlap",
    "simhash_hamming1",
    "daily_anomaly_z",
    # round-5 final additions: the temporal-motif bucketed equi-joins
    # (the exact window must stay a residual on a hash join), the
    # SemDeDup within-cluster dominance join (equi on cluster id), the
    # split-leakage pair/split joins, the LSH-recall compare, the
    # fertility segmentation join, the Markov k x k iteration joins,
    # and the join-free scans that must never degrade (code-switch,
    # k-anonymity).  lt/ic cascades + densest_peel run eagerly and end
    # in checkpoint scans (the lin/betweenness rule); ppr_sweep_cut's
    # sweep stage is lazy and rides a 1-row volume broadcast.
    "temporal_motifs_1h",
    "semdedup_embeddings",
    "split_leakage",
    "minhash_lsh_recall",
    "bpe_fertility",
    "markov_stationary",
    "code_switch_score",
    "k_anonymity",
    "ppr_sweep_cut",
    # hitting_time iterates the same k x k equi-join chain as
    # markov_stationary but carries no scalar broadcast (no BNLJ at
    # all); heaps_law's prefix-sum join is equi on bucket and its only
    # non-equi shape is the 1-row slope broadcast
    "hitting_time",
    "heaps_law",
    # extra-session wave: conversion_prob / behavior_entropy iterate or
    # aggregate the k x k chain (equi only); kneser_ney joins its three
    # count tables on their keys; doc_novelty is explode + min + ONE
    # equi-join; metapath_walks is the random_walks two-join step with
    # a type literal pushed into both joins; pq_distortion aggregates
    # pq_encode's codebook-literal pass; bootstrap_ci / benford /
    # temperature_mixture / centroid_outliers / embedding_covariance
    # are join-free (scalar literals, codegen fan-out) and must never
    # degrade; matryoshka_recall embeds the DECLARED brute-force
    # cosine baseline twice (BNLJ allowed below)
    "conversion_prob",
    "behavior_entropy",
    "kneser_ney_bigram",
    "doc_novelty",
    "metapath_walks",
    "pq_distortion",
    "bootstrap_ci",
    "benford_deviation",
    "temperature_mixture",
    "centroid_outliers",
    "embedding_covariance",
    "matryoshka_recall",
    # centrality_agreement runs the pagerank engine eagerly, then two
    # dense-id range shuffles + one id equi-join; chao1 is explode +
    # two aggregates (join-free); hotset_churn's joins all run on the
    # k-per-day top table
    "centrality_agreement",
    "chao1_vocab",
    "hotset_churn",
    # pagerank_by_role runs the engine eagerly then one role equi-join
    # + a grouped sum; label_separability's scatter pass is zero-join
    # codegen (centroids as CASE literals) + one L-row broadcast join
    "pagerank_by_role",
    "label_separability",
    # triangle_surprise is the degree-oriented triangle path + a 1-row
    # moment cross join (BNLJ allowed below); l_diversity is the
    # k_anonymity double-aggregation with a distinct inside
    "triangle_surprise",
    "l_diversity",
    # cusum: day-grain spine windows + the 1-row day-range broadcast
    "cusum_changepoint",
    # source_jsd: token-keyed pair self-join + S-row broadcast totals
    "source_jsd",
    # kmeans_elbow: per-k codebook-literal assignment (eager fits) + a
    # 1-row aggregate per k, unioned — join-free
    "kmeans_elbow",
    # embedding_health: zero-shuffle flag/norm projection + 1-row stats;
    # the median pass rides 1-row broadcast crossJoins (allowed below)
    "embedding_health",
    # dispersion_index: the canonical double aggregation, join-free
    "dispersion_index",
    # attack_tolerance: eager hub TakeOrdered + literal IN filters, then
    # the CC engine (checkpoint scan) — the final giant agg is join-free
    "attack_tolerance",
    # error_rate_by_activity: the double aggregation again, join-free
    "error_rate_by_activity",
    # random_failure_tolerance: eager hash-rank TakeOrdered + literal IN
    # filters, then the CC engine — same shape as attack_tolerance
    "random_failure_tolerance",
    # clustering_by_degree: degree-oriented wedge machinery + two
    # grouped counts + the log-sized bucket aggregate
    "clustering_by_degree",
    # bm25_topk: literal IN term filter before the tf aggregate,
    # broadcast idf join, TakeOrderedAndProject top-k — no full sort
    "bm25_topk",
    # source_lang_mi: one joint groupBy + two broadcast marginal joins
    "source_lang_mi",
    # triadic_closure: distinct-pair collapse before any join; wedge
    # probe expands from the lower-degree endpoint + left-semi close
    "triadic_closure",
    # lexicon_flag_rate: array-literal lexicon, row-local hit counting,
    # one map-side-combined groupBy — join-free
    "lexicon_flag_rate",
    # graph_hygiene: one arc aggregate + two anti-join counts + 1-row
    # assembly joins
    "graph_hygiene",
    # degree_mixing: distinct-pair projection + two degree equi-joins
    # + one log^2-sized aggregate — strictly edge-linear
    "degree_mixing",
    # intercontact_hist: one pair-partitioned window + one log-sized
    # aggregate — edge-linear, no global window
    "intercontact_hist",
    # corpus_concentration: row-local token counts + two nested
    # aggregates — join-free
    "corpus_concentration",
    # boilerplate_coverage: shingle-stream-linear — one (source,
    # shingle) df aggregate, broadcast threshold, left-semi flag join
    "boilerplate_coverage",
    # cross_source_duplication: distinct (digest, source) projection +
    # digest equi-join (fan-out bounded by the source roster)
    "cross_source_duplication",
    # top_terms_per_doc: tf_idf + per-doc WindowGroupLimit — never a
    # global window
    "top_terms_per_doc",
    "zorder_layout",
    "t_closeness",
    # 2026-08-20 continuation wave: capped-wedge / equi-join-only
    # graph and analytics queries (plans empirically scanned clean)
    "simrank_wedge",
    "collective_influence",
    "guimera_amaral_roles",
    "algebraic_distance_5",
    "umass_coherence",
    "lof_top10",
    "calinski_harabasz",
    "time_decay_attribution",
    "dedup_threshold_curve",
    # and the ones whose only nested-loop is a 1-row/codebook-row
    # broadcast assembly join or a declared brute-force baseline
    # (listed in BNLJ_ALLOWED below)
    "burrows_delta",
    "source_cross_entropy",
    "jonckheere_trend",
    "dbscan_labels",
    "ann_hamming_recall",
    "ann_mrr",
    "kmeans_label_ari",
    "kmeans_label_nmi",
    "kmeans_stability_ari",
    "cka_halves",
    "effective_rank",
    "user_weekly_rhythm",
    "daily_motif_pair",
    "energy_distance",
    "ucb1_channel_scores",
    "lm_heldout_nll",
]

# brute-force baselines DOCUMENTED as broadcast nested-loop scans: the
# exact cosine top-k (and the recall query that embeds it as ground
# truth); every other query must stay equi-join/hashable
BNLJ_ALLOWED = {
    "ann_cosine_topk",
    "ann_lsh_recall",
    # 2026-08-20 continuation: 1-row / codebook-row broadcast assembly
    # joins (totals, eps literals, window spines) or the declared
    # brute-force cosine/Hamming ground-truth scans
    "burrows_delta",
    "source_cross_entropy",
    "jonckheere_trend",
    "dbscan_labels",
    "ann_hamming_recall",
    "ann_mrr",
    "kmeans_label_ari",
    "kmeans_label_nmi",
    "kmeans_stability_ari",
    "cka_halves",
    "effective_rank",
    "user_weekly_rhythm",
    "daily_motif_pair",
    "energy_distance",
    "ucb1_channel_scores",
    "lm_heldout_nll",
    # tiny-literal broadcast sides (4-row k-list / 1-row NF(max)):
    # the nested-loop side is constant-sized, never data-sized
    "rich_club",
    "effective_diameter",
    # 1-row (M/A counts) x 1-row (vertex count) assembly join
    "dyad_census",
    # graph_hygiene: four 1-row audit aggregates assembled crosswise
    "graph_hygiene",
    # 1-row temporal-midpoint aggregate broadcast into the edge scan
    "contact_graph_delta",
    # same 1-row midpoint broadcast + the 1-row added x 1-row closing
    # assembly join (both constant-sized by construction)
    "triadic_closure",
    # 1-row (sum, cnt) balance-stats aggregate broadcast back into the
    # pruned customer sliver (the Q15 max-broadcast-back pattern)
    "tpch_q22_dormant",
    # derive_partsupp rides a 1-row supplier-count scalar into the
    # part x 4 projection (constant-sized build side); Q11 adds the
    # 1-row stock total broadcast back over the per-part values
    "tpch_partsupp_derived",
    "tpch_q2_min_cost_supp",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_counts",
    "tpch_q20_excess_stock",
    # the pair fan-out joins sketch rows against the G-row group list
    # on an inequality — the nested-loop build side is group-count-sized
    "kmv_audience_overlap",
    # group-stats pair frame (G rows x G rows) + the 1-row unit-count
    # broadcast — both constant-sized build sides
    "behavior_correlations",
    # 1-row vertex-count broadcast into the candidate projection
    "negative_sampling_3",
    # 1-row day-range / conversation-count broadcasts
    "activity_trend",
    "dau_wau_stickiness",
    "tool_cooccurrence_pmi",
    # register-row fan-out against the G-row group list
    "hll_audience_overlap",
    # 1-row day-range broadcast builds the spine
    "daily_anomaly_z",
    # 1-row total-volume / truth-found counts / state-count k broadcast
    # sides (constant-sized build sides by construction)
    "ppr_sweep_cut",
    "minhash_lsh_recall",
    "markov_stationary",
    # 1-row fitted-slope broadcast back over the decile curve
    "heaps_law",
    # embeds the declared brute-force cosine baseline (ground truth)
    # on BOTH sides — same standing as ann_cosine_topk / ann_lsh_recall
    "matryoshka_recall",
    # 1-row triangle count x 1-row degree moments assembly join
    "triangle_surprise",
    # 1-row day-range broadcast builds the spine (daily_anomaly rule)
    "cusum_changepoint",
    # 1-row stats / median broadcasts in the assembly joins
    "embedding_health",
}


@pytest.mark.parametrize("name", GUARDED)
def test_no_cartesian_in_plan(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: {plan[:800]}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: {plan[:800]}"


def test_wedge_family_degree_oriented(spark, monkeypatch):
    """The round-4 judge's two scale-killers were the UNORIENTED wedge
    self-joins in the directed-triangle census and the rectangle count
    (in×out / deg² wedge fan-out at a hub).  Both now route every wedge
    through the (degree, id) orientation — assert structurally that the
    orientation machinery is what builds the wedges, so a regression back
    to a raw arc-table self-join fails loudly."""
    import graphlite_spark.algos.triangles as T

    seen: list[tuple[str, str]] = []
    orig_rows, orig_oriented = T._triangle_rows, T._oriented

    def spy_rows(edges, orient, **kw):
        seen.append(("rows", orient))
        return orig_rows(edges, orient, **kw)

    def spy_oriented(edges, orient, **kw):
        seen.append(("oriented", orient))
        return orig_oriented(edges, orient, **kw)

    monkeypatch.setattr(T, "_triangle_rows", spy_rows)
    monkeypatch.setattr(T, "_oriented", spy_oriented)

    arcs = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 1), (2, 4)]
    df = spark.createDataFrame(arcs, "src long, dst long")

    seen.clear()
    row = T.directed_triangle_census(df).collect()[0]
    assert ("rows", "degree") in seen, "census no longer degree-oriented"

    seen.clear()
    T.edge_support(df).collect()
    assert ("rows", "degree") in seen, "edge_support no longer degree-oriented"
    # 1→2→3→1 cyclic; transitive instances incl. (1,2,3) via 1→3 etc.
    assert row["n_cyclic"] >= 1 and row["n_transitive"] >= 1

    seen.clear()
    vdf = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    T.clustering_by_degree(vdf, df).collect()
    assert ("rows", "degree") in seen, "c(k) curve no longer degree-oriented"

    seen.clear()
    T.four_clique_count(df).collect()
    assert ("rows", "degree") in seen, "K4 count no longer degree-oriented"

    seen.clear()
    rect = T.rectangle_count(df).collect()[0]["rectangles"]
    assert ("oriented", "degree") in seen, "rectangles no longer degree-oriented"
    # undirected closure is K4 on {1,2,3,4}: exactly 3 distinct 4-cycles
    assert rect == 3


def test_q19_disjunction_hull_pushes_to_scan(spark):
    """TPC-H Q19's OR-of-conjunctions must not poison the plan: the
    hull predicates (quantity band, brand IN-list, size range) must
    reach BOTH parquet scans and the join must remain a hash equi-join
    on the pure partkey (the OR only as a post-join residual)."""
    df = entrymod.queries()["tpch_q19_disjunctive"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [l_partkey" in plan, plan[:1200]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    flat = " ".join(pushed)
    assert "GreaterThanOrEqual(l_quantity,1.0)" in flat, flat
    assert "LessThanOrEqual(l_quantity,30.0)" in flat, flat
    # toString elides PushedFilters past ~100 chars, so assert the
    # stable prefix of the part-side list (IsNotNull + the brand IN)
    assert "IsNotNull(p_size)" in flat and "In(p_brand" in flat, flat


def test_q6_filters_push_to_scan(spark):
    """TPC-H Q6's whole predicate set must reach the parquet scan
    (PushedFilters) and the projection must prune to the three used
    columns — the scan-bound contract its docstring claims."""
    df = entrymod.queries()["tpch_q6_forecast"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the PushedFilters list is elided past ~100 chars in toString, so
    # assert the stable prefix: every filtered column registered, and the
    # range predicates start pushing (IsNotNull + GreaterThanOrEqual)
    pushed = re.search(r"PushedFilters: \[([^\]]*)", plan)
    assert pushed is not None, plan[:1200]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({frag})" in pushed.group(1), \
            f"{frag} not in PushedFilters: {pushed.group(1)}"
    assert "GreaterThanOrEqual(l_shipda" in pushed.group(1), pushed.group(1)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_extendedprice", "l_discount", "l_quantity", "l_shipdate"}, cols


def test_derive_vertices_never_broadcasts_the_turn_table(spark):
    """r6 derive restructure guard: the dense-id join must broadcast the
    conversation-OFFSETS side (ExistingRDD leaf), never the V-sized
    ranked turn pipeline — a ranked-side broadcast collects every turn
    through the driver (fatal at 10^12 rows; measured as BuildLeft over
    the whole window pipeline before the fix).  Also pins the one-
    exchange shape: the single hash exchange feeds both windows."""
    from graphlite_spark.plans.derive import derive_vertices
    from graphlite_spark.sources.transcripts import transcripts_from_events

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    v = derive_vertices(transcripts_from_events(ev))
    plan = v._jdf.queryExecution().executedPlan().toString()
    # exactly one data Exchange (hash on conv_id); the second exchange
    # of the old plan (user_id window) must not come back
    n_exch = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_exch == 1, f"expected 1 hash exchange, got {n_exch}:\n{plan[:1500]}"
    # the broadcast side must be the checkpointed offsets leaf (Scan
    # ExistingRDD a few nodes below), never the window pipeline (whose
    # subtree contains the parquet scan)
    if "BroadcastExchange" in plan:
        bcast_idx = plan.index("BroadcastExchange")
        subtree = plan[bcast_idx : bcast_idx + 400]
        assert "Scan ExistingRDD" in subtree, subtree
        assert "Scan parquet" not in subtree, subtree
        assert "BuildRight" in plan, plan[:800]
