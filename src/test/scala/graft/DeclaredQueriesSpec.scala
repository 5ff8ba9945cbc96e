package graft

import graft.queries.Declared

/** t2 suite (SURVEY §5.2): every declared query executes on the smoke corpus
  * and returns the row count pinned from the sf0.001 oracle run — a drift
  * guard between driver gate runs. The cross-engine value/hash check itself
  * is the driver's DuckDB gate (dev/check.py replicates it). */
class DeclaredQueriesSpec extends SparkSpec {

  /** Pinned sf0.001 row counts (from a green oracle-checked Verify run). */
  val expectedRows: Map[String, Long] = Map(
    "d01_scan_count" -> 1, "d02_pricing_summary" -> 6, "d03_predicates" -> 305,
    "d04_join_agg" -> 5, "d05_multiway_join" -> 5, "d06_left_join" -> 150,
    "d07_semi_join" -> 130, "d08_anti_join" -> 3, "d09_range_self_join" -> 84,
    "d10_cross_join" -> 50, "d11_having" -> 15, "d12_count_distinct" -> 5,
    "d13_rollup" -> 31, "d14_cube" -> 56, "d15_topk_per_group" -> 449,
    "d16_sessionize" -> 946, "d17_running_balance" -> 1000, "d18_topk" -> 10,
    "d19_set_ops" -> 295, "d20_strings" -> 150, "d21_consecutive_days" -> 266,
    "d22_math" -> 6000, "d23_arrays" -> 500, "d24_json" -> 1000,
    "d25_conditional" -> 15, "d26_latest_state" -> 15,
    "d27_first_occurrence" -> 15, "d28_regularity_cohort" -> 10,
    "d29_hex_encode" -> 150,
    "d30_p3_value_cohort" -> 6, "d31_p5_crosssell" -> 2,
    "d32_asof_join" -> 202, "d33_pivot" -> 15, "d34_stats_moments" -> 3,
    "d35_unpivot" -> 9, "d36_scalar_subquery" -> 764,
    "d37_value_windows" -> 1000, "d38_moving_window" -> 1000,
    "d39_gap_fill" -> 449, "d40_rank_stats" -> 1000,
    "l21_tfidf_topk" -> 1500, "l22_vocab_topk" -> 31,
    "l23_label_centroids" -> 640,
    "l01_exact_dedup" -> 500, "l02_jaccard_pairs" -> 28,
    "l03_minhash_lsh" -> 28, "l04_simhash_pairs" -> 59,
    "l05_cosine_topk" -> 40, "l06_ann_lsh" -> 16,
    "l07_lang_id" -> 500, "l08_quality" -> 500, "l09_token_counts" -> 500,
    "l10_fingerprints" -> 485, "l11_multimodal_decode" -> 500,
    "l12_profile" -> 5, "l13_udaf_sumsq" -> 5, "l14_cosine_near_dups" -> 26,
    "l15_stable_split" -> 500, "l16_dedup_clusters" -> 45,
    "l17_ann_ivf" -> 24, "l18_clean_text" -> 500, "l19_sequence_pack" -> 500,
    // 3641 = Σ image heights since round 10's PPM upgrade (one frame per
    // scanline; previously one per 32-byte text slice)
    "l20_frame_sample" -> 3641)

  SparkEntry.allDeclared.foreach { q =>
    test(s"${q.name} executes, non-empty, expected rows") {
      val df = q.build(spark, sf001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      expectedRows.get(q.name).foreach(e => assert(n === e, s"row count drifted"))
      assert(n > 0)
    }
  }

  test("every SQL-expressible query has an oracle with matching discipline") {
    // Alias hygiene: the driver compares under name-sorted columns, so a
    // query's output column set must appear verbatim in its oracle SQL.
    SparkEntry.allDeclared.flatMap(q => q.oracle.map(q -> _)).foreach { case (q, sql) =>
      val cols = q.build(spark, sf001).columns
      // Word-boundary match: substring contains is vacuous for 1-char
      // column names ('n', 'v' match any SQL text).
      cols.foreach(c =>
        assert(("(?i)(^|[^a-z0-9_])" + java.util.regex.Pattern.quote(c.toLowerCase)
          + "($|[^a-z0-9_])").r.findFirstIn(sql.toLowerCase).isDefined,
          s"${q.name}: output column '$c' not mentioned in oracle SQL"))
    }
  }
}
