package graft

/** Plan-audit main: dumps `explain(formatted)` for representative queries
  * and greps the properties that matter at scale — PushedFilters reaching
  * the parquet scan, ReadSchema pruning, broadcast joins on dimension
  * tables, WholeStageCodegen coverage. Usage:
  *   sbt "runMain graft.ExplainAudit [queryName ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("explain-audit")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_filter_status", "q02_filter_time_in", "q05_agg_composite",
        "q11_join_fk", "q12_join_dim_chain", "q14_window_topn", "q31_cosine_topk",
        "q46_auth_login", "q47_session_lifecycle", "q50_feature_rollout",
        "q51_running_counters", "q63_watermark_windows", "q64_ann_recall",
        "q65_decontamination", "q67_tfidf_topk", "q69_repetition_quality",
        "q74_incremental_dedup", "q81_quality_funnel", "q82_corpus_diff",
        "q83_incremental_neardup", "q84_inverted_index", "q85_pack_segments",
        "q86_source_centroids", "q89_semantic_dedup", "q90_cluster_histogram",
        "q91_embedding_quantize", "q92_event_funnel", "q93_zorder_code",
        "q94_quantized_topk", "q95_perdim_quantize",
        "q103_bloom_decontamination", "q104_chunk_dedup",
        "q105_component_keep_best", "q106_hard_negatives",
        "q153_bm25_topk", "q160_phrase_match", "q164_best_passage",
        "q163_textrank", "q168_ltr_features", "q173_blocklist_redact",
        "q192_ivfpq_residual_topk", "q193_ivfpq_refine",
        "q194_prefix_refine_topk", "q195_similarity_join",
        "q196_pca_top_component", "q197_pca_project",
        "q198_jl_project", "q199_jl_topk",
        "q204_image_neardup_pairs", "q205_two_stage_dedup",
        "q207_image_incremental_neardup",
        "q209_phrase_merge", "q210_mink_membership",
        "q211_scd2_merge", "q212_cms_join_estimate",
        "q213_kcenter_coreset", "q214_quality_constraints",
        "q215_zorder_skipping")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n======== $name ========")
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          println(plan)
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r
            .findAllIn(plan).mkString("; ")
          val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).mkString("; ")
          // AQE finalizes (and codegen-wraps) the plan only at execution —
          // and only on THIS QueryExecution, so drive its own RDD (a
          // `.write` would plan a fresh execution and leave this one cold)
          df.queryExecution.toRdd.count()
          val executed = df.queryExecution.executedPlan.toString
          // codegen'd operators print as "*(N) OperatorName" in the final plan
          val codegen = "\\*\\((\\d+)\\)".r
            .findAllMatchIn(executed).map(_.group(1)).toSet.size
          val broadcasts = "BroadcastHashJoin|BroadcastNestedLoop".r
            .findAllIn(plan).size
          println(s"[audit] $name pushed=[$pushed]")
          println(s"[audit] $name readSchema=[$schemas]")
          println(s"[audit] $name codegenSpans=$codegen broadcastJoins=$broadcasts")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
