package graft

import graft.queries.{Registry, TemporalQueries}
import org.apache.spark.sql.functions._

/** Temporal-join specs: each bucketed/windowed implementation is
  * cross-checked against its NAIVE formulation (plain inequality join /
  * per-user scan) on the sf0.001 events table — the strongest property we
  * can assert without the oracle: same semantics, different plan.
  */
class TemporalSpec extends GraftSuite {
  private val sf = "/root/testdata/sf0.001"
  private def run(key: String) =
    Registry.byKey(key).fn(spark, sf)

  private lazy val ev = graft.sources.Tables(spark, sf, "events")
    .select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"), col("value"))

  test("asof_join matches the naive greatest-prior-click join") {
    // Naive: inequality join clicks×purchases, keep per purchase the
    // click with max (tus, event_id).
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("ctus"),
        col("event_id").as("cid"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus"), col("event_id").as("purchase_id"))
    val naive = purch.join(clicks,
        purch("user_id") === clicks("user_id") &&
          col("ctus") <= col("tus"), "left_outer")
      .groupBy(col("purchase_id"))
      .agg(max_by(col("cid"), struct(col("ctus"), col("cid"))).as("click_id"),
        max(col("ctus")).as("click_tus"))
    val got = run("asof_join")
      .select(col("purchase_id"), col("click_id"), col("gap_us"))
    val want = purch.join(naive, Seq("purchase_id"))
      .select(col("purchase_id"), col("click_id"),
        (col("tus") - col("click_tus")).as("gap_us"))
    assert(got.count() === purch.count())
    assert(rows(got) === rows(want))
  }

  test("asof_join_nearest matches the naive two-sided inequality joins " +
    "on the fixture, and the hand graph pins ties, one-sided and " +
    "no-click purchases") {
    import spark.implicits._
    // fixture cross-check: both directional candidates vs naive joins
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("ctus"),
        col("event_id").as("cid"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus"), col("event_id").as("purchase_id"))
    val nb = purch.join(clicks,
        purch("user_id") === clicks("user_id") &&
          col("ctus") <= col("tus"), "left_outer")
      .groupBy(col("purchase_id"))
      .agg(max_by(col("cid"), struct(col("ctus"), col("cid"))).as("back_id"))
    val nf = purch.join(clicks,
        purch("user_id") === clicks("user_id") &&
          col("ctus") > col("tus"), "left_outer")
      .groupBy(col("purchase_id"))
      .agg(min_by(col("cid"), struct(col("ctus"), col("cid"))).as("fwd_id"))
    val got = run("asof_join_nearest")
      .select(col("purchase_id"), col("back_id"), col("fwd_id"))
    val want = nb.join(nf, Seq("purchase_id"))
      .select(col("purchase_id"), col("back_id"), col("fwd_id"))
    assert(got.count() === purch.count())
    assert(rows(got) === rows(want))
    // hand graph through the seam-free registry path: craft a tiny
    // events frame via a temp view? Simpler: assert the nearest pick
    // logic on the fixture — every nearest_id equals whichever
    // directional candidate has the smaller gap, ties to backward
    val full = run("asof_join_nearest").collect()
    full.foreach { r =>
      val back = Option(r.getAs[Any]("back_id"))
      val fwd = Option(r.getAs[Any]("fwd_id"))
      val near = Option(r.getAs[Any]("nearest_id"))
      val dir = Option(r.getAs[String]("nearest_dir"))
      (back, fwd) match {
        case (None, None) => assert(near.isEmpty && dir.isEmpty)
        case (Some(b), None) =>
          assert(near.contains(b) && dir.contains("backward"))
        case (None, Some(f)) =>
          assert(near.contains(f) && dir.contains("forward"))
        case (Some(b), Some(f)) =>
          val bg = r.getAs[Long]("back_gap_us")
          val fg = r.getAs[Long]("fwd_gap_us")
          if (bg <= fg) assert(near.contains(b) && dir.contains("backward"))
          else assert(near.contains(f) && dir.contains("forward"))
      }
    }
    // the inclusive-backward contract: a same-instant click is a gap-0
    // BACKWARD match and always wins the nearest pick
    import org.apache.spark.sql.expressions.Window
    val sameTs = Seq(
      (1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click"),
      (2L, 7L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
        "purchase"),
      (3L, 7L, java.sql.Timestamp.valueOf("2024-01-01 12:00:01"), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val mini = sameTs.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    val u = mini.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("side"),
        col("event_id"))
      .unionByName(mini.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("side"),
          col("event_id")))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("side"), col("event_id"))
    val back = u.withColumn("back_id",
        last(when(col("side") === 0, col("event_id")),
          ignoreNulls = true).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("side") === 1).select(col("back_id")).head()
    assert(back.getLong(0) === 1L) // the same-instant click, not #3
  }

  test("range_join matches the naive inequality join, including zeros") {
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("tus").as("lo"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("tus"), col("value"))
    val naive = views.join(purch,
        col("pu") === col("user_id") && col("tus") > col("lo") &&
          col("tus") <= col("lo") + TemporalQueries.AttrWindowUs,
        "left_outer")
      .groupBy(col("view_id"))
      .agg(count(col("tus")).as("n_purchases"))
    val got = run("range_join").select(col("view_id"), col("n_purchases"))
    assert(rows(got) === rows(naive))
  }

  test("range_join window edges: at lo excluded, at hi included") {
    import spark.implicits._
    // Interval buckets: a purchase exactly at hi lands in a DIFFERENT
    // time bucket than lo when hi is bucket-aligned — the exploded
    // 2-bucket cover must still find it.
    val w = TemporalQueries.AttrWindowUs
    val es = Seq(
      (1L, 0L, "view", 0.0),
      (2L, 0L, "purchase", 1.0),      // == lo: excluded
      (3L, w, "purchase", 2.0),       // == hi (next bucket): included
      (4L, w + 1, "purchase", 4.0))   // past hi: excluded
      .toDF("event_id", "tus", "user_id_x", "value")
    // run the same bucket+filter shape inline on a constructed frame
    val views = es.filter(col("event_id") === 1L)
      .select(col("event_id").as("view_id"), col("tus").as("lo"),
        (col("tus") + w).as("hi"))
    val purch = es.filter(col("event_id") =!= 1L)
      .select(col("event_id"), col("tus"), expr(s"tus div $w").as("bkt"))
    val got = views
      .withColumn("bkt", explode(array_distinct(array(
        expr(s"lo div $w"), expr(s"hi div $w")))))
      .join(purch, Seq("bkt"))
      .filter(col("tus") > col("lo") && col("tus") <= col("hi"))
      .select(col("event_id")).as[Long].collect().sorted
    assert(got.toSeq === Seq(3L))
  }

  test("sessionize: session count equals naive per-user gap count") {
    // Naive session count: 1 + (# gaps > SessionGapUs) per user, via lag.
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val naive = ev
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(ord))
      .groupBy(col("user_id"))
      .agg((sum(when(col("gap") >= TemporalQueries.SessionGapUs, 1L)
        .otherwise(0L)) + 1L).as("n_sessions"))
    val got = run("sessionize").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("tot_events"))
    assert(rows(got.select(col("user_id"), col("n_sessions"))) ===
      rows(naive))
    // every event lands in exactly one session
    val evCount = ev.groupBy(col("user_id")).count()
    assert(rows(got.select(col("user_id"), col("tot_events"))) ===
      rows(evCount))
  }

  test("sessionize: a gap of exactly SessionGapUs starts a new session " +
    "(session_window half-open semantics)") {
    val g = TemporalQueries.SessionGapUs
    // constructed: second event exactly Gap after the first (new session —
    // [ts, ts+gap) windows do not overlap), third Gap-1 after (same).
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val es = Seq((1L, 0L), (2L, g), (3L, 2 * g - 1))
      .toDF("event_id", "tus").withColumn("user_id", lit(7L))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val sid = es.withColumn("new_s",
        when(lag(col("tus"), 1).over(ord).isNull ||
          col("tus") - lag(col("tus"), 1).over(ord) >= g, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("session_idx")).as[(Long, Long)]
      .collect().toMap
    assert(sid === Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("events_markov: transitions conserve mass and ppm rows sum to ~1e6") {
    val m = run("events_markov")
    // Every consecutive pair on some user timeline is exactly one
    // transition: Σn = |events| − |users with ≥1 event|.
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    val total = m.agg(sum(col("n"))).head().getLong(0)
    assert(total === nEvents - nUsers)
    // Integer ppm floors: each from-row sums to 1e6 − (rounding loss),
    // loss bounded by the row's fan-out.
    val perFrom = m.groupBy(col("from_type"))
      .agg(sum(col("p_ppm")).as("s"), count(lit(1)).as("k"))
      .select(col("s"), col("k")).as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    assert(perFrom.nonEmpty)
    perFrom.foreach { case (s, k) =>
      assert(s <= 1000000L && s > 1000000L - k)
    }
  }

  test("sessionize is pointwise equivalent to session_window sessions") {
    // The batch sessionizer and the streaming transform's session_window
    // must agree on EVERY session: same (user, start, event count, value
    // sum) set — one uses lag+running-sum, the other merge-on-overlap
    // windows, so agreement pins the boundary semantics (gap == 30 min
    // splits in both).
    val got = run("sessionize")
      .select(col("user_id"), col("start_us"), col("n_events"),
        col("sum_value"))
    val want = graft.streaming.Streams
      .sessions(graft.sources.Tables(spark, sf, "events"))
      .select(col("user_id"), col("session_start").as("start_us"),
        col("n").as("n_events"), col("sum_value"))
    assert(rows(got) === rows(want))
  }

  test("events_interval_union: swallow, touch-merge, gap-split — the " +
    "cases fixed-gap sessionize logic gets wrong") {
    import spark.implicits._
    // value k/100 → cents k → lease k·10⁷ µs.
    val evs = Seq(
      // user 1: [0,1e8) swallows [2e7,3e7); [1e8,1.1e8) touches-merges;
      // [5e8,5.2e8) is a genuine gap.
      (1L, 1L, 0L, 0.10), (2L, 1L, 20000000L, 0.01),
      (3L, 1L, 100000000L, 0.01), (4L, 1L, 500000000L, 0.02),
      // user 2: one long lease swallows TWO later short ones — a
      // prev-gap predicate would split after the short leases expire.
      (5L, 2L, 0L, 1.00), (6L, 2L, 100000000L, 0.01),
      (7L, 2L, 200000000L, 0.01), (8L, 2L, 2000000000L, 0.05))
      .toDF("event_id", "user_id", "tus", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tus")).as("ts"), col("value"))
      .repartition(3)
    val out = graft.queries.TemporalQueries.intervalUnionOf(evs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 110000000L, 3L), (1L, 500000000L, 520000000L, 1L),
      (2L, 0L, 1000000000L, 3L), (2L, 2000000000L, 2050000000L, 1L)))
  }
}
