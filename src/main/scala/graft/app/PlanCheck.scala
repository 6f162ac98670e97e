package graft.app

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries so plan
  * regressions (lost pushdown / broadcast / codegen) are visible. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("q_agg_pricing", "q_join_agg", "q_chunk_filter",
      "q_window_top1", "q_exact_dedup", "q_cosine_topk", "q_token_count", "q_gopher",
      "q_repetition", "q_dup_spans", "q_dupspan_removal", "q_bm25", "q_tfidf", "q_line_dedup", "q_strat_sample",
      "q_sessionize", "q_asof_join", "q_dsir_weights", "q_lm_ppl",
      "q_clean_text", "q_url_scan", "q_domain_stats", "q_domain_filter",
      "q_nb_classify", "q_entropy")
    // q_cc_bigstar is deliberately absent: dedupClustersHandle stageCuts
    // the verified pair table and runs the whole star-contraction loop at
    // DataFrame-construction time, so its "plan" is just a cached-RDD
    // scan — same reason q_dedup_clusters/q_semantic_dedup are absent
    interesting.foreach { name =>
      println(s"\n===================== $name =====================")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
    // the KG query plans matter under the ENGINE session (autoBroadcast
    // disabled — explicit broadcast() hints must carry the tiny hit sides)
    val es = graft.core.Sessions.local(8, "graft-plan-check-kg")
    Seq("kg_search_enriched", "kg_viz_nodes").foreach { name =>
      println(s"\n===================== $name (engine session) =====================")
      graft.SparkEntry.queries(name)(es, sfDir).explain("formatted")
    }
    es.stop()
  }
}
