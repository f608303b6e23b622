package graft.streaming

import graft.util.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms (SURVEY §2.10 — extension; the reference is
  * DataSet-only and has NO streaming). Each transform is a plain
  * DataFrame→DataFrame function usable in BOTH batch (`spark.read`, the
  * DuckDB-oracled twin) and Structured Streaming (`spark.readStream` +
  * watermark — exercised in StreamingSpec with a rate/memory source).
  *
  * Scale notes: all aggregations key on (window, event_type)/(user) —
  * state is bounded by watermarking in stream mode; in batch mode they are
  * ordinary hash aggregations.
  */
object Streams {
  /** T1 — tumbling 1h count/sum per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.decSum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** T2 — sliding 1h window, 15m slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"))

  /** T3 — session windows per user, 30m gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), Det.decSum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))

  /** T4 — dedup by event_id (stream mode adds
    * `withWatermark + dropDuplicatesWithinWatermark`).
    */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** T5 — running per-user aggregate (update-mode state in stream mode). */
  def userCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), Det.decSum(col("value")).as("sum_value"))

  // ---- stream-mode variants (watermarked) ----

  def tumblingStream(events: DataFrame): DataFrame =
    tumbling(events.withWatermark("ts", "1 hour"))

  def slidingStream(events: DataFrame): DataFrame =
    sliding(events.withWatermark("ts", "1 hour"))

  def sessionsStream(events: DataFrame): DataFrame =
    sessions(events.withWatermark("ts", "1 hour"))

  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** T5 variant with EXPLICIT custom state (`mapGroupsWithState`) — the
    * escape hatch for stateful logic Spark's built-in aggregates can't
    * express (per-key state machines, custom eviction). Here the state is
    * a running (count, sum) per user, updated per micro-batch; in batch
    * mode the same code degenerates to a single-pass group aggregate.
    *
    * Scale notes: state lives in the state store keyed by user — bounded
    * by |users|, partitioned by the grouping key across executors; a real
    * deployment adds a timeout (`GroupStateTimeout`) to evict idle keys.
    */
  def userCountsStateful(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var (n, sum) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { case (_, v) => n += 1; sum += v }
        state.update((n, sum))
        (uid, n, sum)
      }
      .toDF("user_id", "n", "sum_value")
  }
}
