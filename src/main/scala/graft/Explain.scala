package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection tool: prints `explain("formatted")` for the
  * given query keys (default: a representative set) so scan pushdown,
  * join strategy, and whole-stage-codegen coverage can be audited.
  *
  * Usage: runMain graft.Explain [sfDir] [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys =
      if (args.length > 1) args.tail.toSeq
      else Seq("substrate_scan_filter_project", "substrate_hash_join",
        "out_degrees", "triplets", "filter_on_vertices", "sim_topk",
        "dedup_minhash", "substrate_window_rank", "sim_knn_join",
        "asof_join", "degree_assortativity", "emb_power_iter",
        "scan_graph_user", "reduce_on_neighbors_user", "dedup_metrics",
        "bpe_merges_sampled", "sim_topk_pq", "sim_topk_ivfpq", "doc_filter",
        "sim_recall_metrics", "pagerank_personalized", "lang_id_confusion",
        "corpus_mixture", "substrate_star_join", "events_zscore")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // Session-construction contract shared with Verify/Bench/TestBase:
      // UTC pin + legacy nanos read policy for the events scan.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n======== $k ========")
      queries.Registry.byKey.get(k) match {
        case Some(q) =>
          val df = q.fn(spark, sfDir)
          df.explain("formatted")
          // Simple mode marks whole-stage-codegen stages with '*(n)'.
          println("-------- codegen spans --------")
          df.explain()
        case None    => println(s"unknown key: $k")
      }
    }
    spark.stop()
  }
}
