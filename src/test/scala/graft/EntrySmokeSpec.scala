package graft

import org.scalatest.funsuite.AnyFunSuite
import SparkTestSession._

/** Smoke: every declared query runs at sf0.001 and key ones return rows.
  * Hash-level correctness against DuckDB is the driver's job (Verify).
  */
class EntrySmokeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  private val mustBeNonEmpty = Set(
    "bfs_levels", "bfs_pregel", "reachable_by_level", "dfs_leaves",
    "degree_hist", "connected_components", "graph_scan", "graph_add_roundtrip",
    "route_assignment", "parse_requests", "q1_agg", "top_revenue",
    "rollup_orders", "events_sessions", "events_type_stats", "events_hourly",
    "dedup_exact", "embedding_topk", "embedding_topk_ivf", "lang_id",
    "quality_score", "token_stats", "doc_fingerprint", "winnow_fingerprint",
    "media_stats", "media_features", "latest_order_per_cust",
    "supplier_part_counts", "cust_no_orders", "bfs_bipartite", "pagerank_top20",
    "term_freq_top50", "tfidf_top_terms", "events_funnel", "asof_last_order",
    "events_within_5s", "embedding_topk_ivf_kmeans", "dfs_leaves_pregel",
    "cube_orders", "media_frames", "train_val_split", "source_quota",
    "bfs_multi", "grouping_sets_orders", "pii_scrub", "corpus_profile",
    "events_rolling", "simhash_pairs", "embedding_neardup",
    "embedding_neardup_exact", "dedup_clusters", "length_strata",
    "hash_sample", "sssp_bounded", "events_transitions", "ppr_top20",
    "neighbor_degree_stats", "bigram_freq_top50", "char_entropy",
    "lang_confusion", "repeat_customers", "media_resize",
    "frequent_part_pairs", "bm25_top_docs", "rrf_fusion", "skyline_parts",
    "equi_depth_hist", "events_pivot", "embedding_quantized_topk",
    "cms_term_counts", "merge_upsert", "zorder_zonemap", "inverted_index",
    "topk_per_group", "subtree_sizes", "graph_centrality", "weighted_sample",
    "drift_ks", "media_phash", "media_dup_groups", "cohort_retention",
    "attribution_last_touch", "events_unpivot", "matrix_source_scan",
    "graph_version_diff", "linear_count_users", "graph_eccentricity",
    "cumulative_users", "markov_next_event", "hourly_drawdown",
    "ab_test_conversion", "bigram_pmi_top50", "assoc_rules_top50",
    "rfm_segments", "ship_latency_quantiles", "matrix_sink_roundtrip",
    "wpagerank_top20", "graph_diameter_lb", "stream_user_totals",
    "funnel_by_arm", "session_stats", "powerlaw_alpha",
    "kmv_distinct_users", "hll_distinct_users", "segment_priority_revenue",
    "local_supplier_volume", "nation_flow_pairs", "two_hop_reach",
    "zipf_alpha_terms", "leakage_safe_split", "kmv_segment_overlap",
    "graph_random_walks", "scc_components", "kmv_users_per_type",
    "bootstrap_ci_mean", "events_ewma", "stream_kmv_users",
    "sequence_packing", "incremental_agg_maintenance")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val n = fn(spark, dir).count()
      if (mustBeNonEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
