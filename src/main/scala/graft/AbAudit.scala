package graft

import org.apache.spark.sql.SparkSession

/** One-off A/B audit harness (round 10, judge item #4): times the
  * `_build:embpairs` + `_build:adcscored` warm pair in one session so a
  * shared-normalized-frame variant can be measured against the current
  * code on identical terms. Not part of the driver contract; removed or
  * kept as a measurement tool only.
  */
object AbAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ab-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ab] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("embpairs")(queries.SimQueries.warmEmbPairs(spark, sfDir))
    time("adcscored")(queries.SimQueries.warmAdcScored(spark, sfDir))
    // the two heaviest direct consumers, post-warm
    time("dedup_embedding")(
      queries.Registry.byKey("dedup_embedding").fn(spark, sfDir).count())
    time("sim_topk_ivfpq")(
      queries.Registry.byKey("sim_topk_ivfpq").fn(spark, sfDir).count())
    Caches.evict(spark)
    spark.stop()
  }
}
