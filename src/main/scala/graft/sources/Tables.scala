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
        // events.ts has shipped under two physical encodings across fixture
        // generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to
        // read natively — needs the nanosAsLong legacy conf + a manual
        // ns→µs conversion) and plain TIMESTAMP(MICROS)/NTZ (read natively).
        // Branch on the *scanned* schema so a regenerated fixture can never
        // break analysis again (the round-6 lesson: hard-coding one encoding
        // took down every events-derived key when the testdata moved).
        // The conf is consulted again when the scan RDD is built, so it
        // cannot be set-and-restored here — it must hold for the lifetime
        // of any events frame; setting it is harmless when ts is already a
        // timestamp (it only affects NANOS columns).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Align an events frame's `ts` to the session-UTC `TimestampType` every
    * downstream operator and oracle expects, whatever physical encoding the
    * current fixture generation shipped. Shared by the batch read above and
    * the streaming specs (the file-source stream scans the same parquet).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType | IntegerType =>
        // nanos-as-long path: integer division (fp would lose precision:
        // ns epochs exceed double's 2^53 exact range).
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ =>
        // TIMESTAMP_NTZ (or any other temporal encoding).
        df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Drop memoized plan objects for `spark` (no persisted data here). */
  def evict(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach(cache.remove)
}
