package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Parquet table access for the driver-generated star schema
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design):
  *  - `spark.read.parquet` gives the vectorized columnar reader; predicate
  *    pushdown + column pruning reach the scan automatically as long as
  *    callers express filters/projections as `Column` expressions (never
  *    opaque closures) — design rule #1 from SURVEY §4.
  *  - We deliberately do NOT `.cache()` base tables: at the target scale they
  *    do not fit in memory. Only small derived artifacts (the G_trade vertex/
  *    edge sets, ~|customers|+|suppliers| rows) are persisted, in
  *    [[GTrade]].
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Plan-object memoization only (avoids re-running schema inference per
  // query); no data is persisted here.
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), {
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
        // read natively; read it as a nanos Long and convert to a proper
        // TimestampType (µs) with integer division (fp division would lose
        // precision: ns epochs exceed double's 2^53 exact range).
        // The conf is consulted again when the scan RDD is built, so it
        // cannot be set-and-restored here — it must hold for the lifetime
        // of any events frame. Our own entry points (Verify/Bench/tests)
        // declare it at session construction; this set is the documented
        // fallback for ad-hoc user sessions (a lasting session-level
        // side effect of first touching `events`).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/$name.parquet")
          .withColumn("ts", org.apache.spark.sql.functions
            .expr("timestamp_micros(ts div 1000)"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Drop memoized plan objects for `spark` (no persisted data here). */
  def evict(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach(cache.remove)
}
