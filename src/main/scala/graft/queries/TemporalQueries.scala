package graft.queries

import graft.sources.Tables
import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over the events table — the operators a training-data /
  * analytics pipeline needs that Spark has no native operator for (the
  * builder mandate names as-of join and range join explicitly). Each is
  * implemented in its canonical DISTRIBUTED shape — never a per-row probe
  * or a driver loop:
  *
  *  - as-of join: union both sides, one shuffle on the key, and a running
  *    `last(..., ignoreNulls)` window — the merge-sort formulation. A
  *    sort-merge as-of is what single-node engines do per key; the union +
  *    window IS that merge, but partitioned by key across executors.
  *  - range join: bucket the time axis at the interval width so every
  *    interval covers ≤ 2 buckets, equi-join on (key, bucket), then filter
  *    the exact containment — the bucketed-equi-join shape that avoids the
  *    O(|points|·|intervals|) inequality join a naive plan produces.
  *  - sessionize: lag + running sum over one per-key window — the batch
  *    twin of `stream_session`'s session windows.
  *
  * Determinism (SURVEY §7.3): all arithmetic is exact integer µs
  * (`unix_micros` / `epoch_us`); the only doubles are raw `value` sums in
  * exact decimal ([[Det.decSum]]). Window orderings are totalized with
  * `event_id` so ties cannot reorder across engines.
  *
  * Scale notes (100 TB): each key is one shuffle on `user_id` (plus one
  * broadcast-free hash agg); the hazard all three share is a hot key — a
  * bot user with millions of events serializes its partition's window
  * sort. At production scale, bound per-key rows upstream (the
  * [[DedupQueries.MaxShingleDf]] df-cap pattern) or pre-split hot users by
  * day before sessionizing.
  */
object TemporalQueries {
  /** Session gap: a ≥ 30 min silence starts a new session (matches
    * `stream_session`'s gap).
    */
  final val SessionGapUs: Long = 30L * 60 * 1000000

  /** Attribution window for the range join: a purchase counts toward a
    * view it follows within 2 hours.
    */
  final val AttrWindowUs: Long = 2L * 3600 * 1000000

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** asof_join — for every purchase event, the most recent click by the
    * same user at-or-before the purchase (inclusive), plus the gap in µs;
    * purchases with no prior click keep NULLs (left as-of join).
    *
    * Shape: tag clicks side=0 / purchases side=1, union, then one window
    * per user ordered by (ts, side, event_id) carrying the last non-null
    * click forward. side=0 sorting before side=1 at equal ts makes the
    * match inclusive; event_id totalizes equal-ts clicks (latest id wins)
    * so both engines pick the same row. One shuffle, no join at all.
    */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    val u = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("side"), col("event_id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("side"),
          col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("click_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("click_tus",
        last(when(col("side") === 0, col("tus")), ignoreNulls = true)
          .over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), (col("tus") - col("click_tus")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  private val asofJoinSql =
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS tus, 0 AS side, event_id
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts) AS tus, 1 AS side, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT user_id, tus, side, event_id,
      |    LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS click_id,
      |    LAST_VALUE(CASE WHEN side = 0 THEN tus END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS click_tus
      |  FROM u)
      |SELECT event_id AS purchase_id, user_id, click_id,
      |  tus - click_tus AS gap_us
      |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin

  /** X198 — asof_join_nearest: the DIRECTIONAL as-of family completed
    * (pandas merge_asof's backward / forward / nearest trio; X24 ships
    * backward only): for every purchase, BOTH the most recent click
    * at-or-before (inclusive, X24's semantics — a same-instant click
    * is a gap-0 backward match) and the first click strictly after,
    * each with its gap, plus the NEAREST pick — smaller absolute gap,
    * ties to backward (the causal side: attribution prefers the click
    * that could have caused the purchase). Purchases with clicks on
    * neither side keep NULLs everywhere.
    *
    * Shape: the X24 single-window plan run in BOTH frame directions
    * over one union — backward = last click in the unbounded-preceding
    * frame (latest id at equal ts), forward = first click in the
    * following frame ordered (ts, side, id) (earliest id at its ts;
    * side 0 < 1 keeps same-instant clicks out of the forward frame, so
    * the two candidates never double-count one click). Still ONE
    * shuffle, no join — the as-of family's whole scale story.
    */
  private def asofJoinNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    val u = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), lit(0).as("side"), col("event_id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), lit(1).as("side"),
          col("event_id")))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("side"), col("event_id"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u
      .withColumn("back_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(wb))
      .withColumn("back_tus",
        last(when(col("side") === 0, col("tus")), ignoreNulls = true)
          .over(wb))
      .withColumn("fwd_id",
        first(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(wf))
      .withColumn("fwd_tus",
        first(when(col("side") === 0, col("tus")), ignoreNulls = true)
          .over(wf))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("back_id"), (col("tus") - col("back_tus")).as("back_gap_us"),
        col("fwd_id"), (col("fwd_tus") - col("tus")).as("fwd_gap_us"))
      .withColumn("nearest_id",
        when(col("back_id").isNull, col("fwd_id"))
          .when(col("fwd_id").isNull, col("back_id"))
          .when(col("back_gap_us") <= col("fwd_gap_us"), col("back_id"))
          .otherwise(col("fwd_id")))
      .withColumn("nearest_dir",
        when(col("back_id").isNull && col("fwd_id").isNull,
          lit(null).cast("string"))
          .when(col("back_id").isNull, lit("forward"))
          .when(col("fwd_id").isNull, lit("backward"))
          .when(col("back_gap_us") <= col("fwd_gap_us"), lit("backward"))
          .otherwise(lit("forward")))
      .orderBy(col("purchase_id"))
  }

  private val asofJoinNearestSql =
    """WITH nu AS (
      |  SELECT user_id, epoch_us(ts) AS tus, 0 AS side, event_id
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts) AS tus, 1 AS side, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |nw AS (
      |  SELECT user_id, tus, side, event_id,
      |    LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS back_id,
      |    LAST_VALUE(CASE WHEN side = 0 THEN tus END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS back_tus,
      |    FIRST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS fwd_id,
      |    FIRST_VALUE(CASE WHEN side = 0 THEN tus END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, side, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS fwd_tus
      |  FROM nu)
      |SELECT event_id AS purchase_id, user_id,
      |  back_id, tus - back_tus AS back_gap_us,
      |  fwd_id, fwd_tus - tus AS fwd_gap_us,
      |  CASE WHEN back_id IS NULL THEN fwd_id
      |       WHEN fwd_id IS NULL THEN back_id
      |       WHEN tus - back_tus <= fwd_tus - tus THEN back_id
      |       ELSE fwd_id END AS nearest_id,
      |  CASE WHEN back_id IS NULL AND fwd_id IS NULL THEN NULL
      |       WHEN back_id IS NULL THEN 'forward'
      |       WHEN fwd_id IS NULL THEN 'backward'
      |       WHEN tus - back_tus <= fwd_tus - tus THEN 'backward'
      |       ELSE 'forward' END AS nearest_dir
      |FROM nw WHERE side = 1 ORDER BY purchase_id""".stripMargin

  /** range_join — view→purchase attribution: for every view event, how
    * many purchases the same user made in `(view_ts, view_ts + 2 h]`, and
    * their exact-decimal value sum. Views with no attributed purchase
    * report (0, 0.0).
    *
    * Shape: the time axis is bucketed at exactly the window width, so
    * every interval covers at most 2 buckets (its endpoints' buckets) and
    * every point exactly 1 — the candidate join is a plain equi-join on
    * (user_id, bucket) with no duplicate candidates, followed by the
    * exact containment filter. The oracle runs the same semantics as a
    * naive inequality join; at scale the bucketed plan does
    * O(|views| + |purchases|) shuffle work where the inequality join is a
    * per-user cross product.
    */
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("tus").as("lo"), (col("tus") + AttrWindowUs).as("hi"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus"), col("value"),
        expr(s"tus div $AttrWindowUs").as("bkt"))
    val cand = views
      .withColumn("bkt", explode(array_distinct(array(
        expr(s"lo div $AttrWindowUs"), expr(s"hi div $AttrWindowUs")))))
      .join(purch, Seq("user_id", "bkt"))
      .filter(col("tus") > col("lo") && col("tus") <= col("hi"))
    val agg = cand.groupBy(col("view_id"))
      .agg(count(lit(1)).as("n_purchases"),
        Det.decSum(col("value")).as("sum_value"))
    views.join(agg, Seq("view_id"), "left_outer")
      .select(col("view_id"), col("user_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("view_id"))
  }

  private val rangeJoinSql =
    s"""WITH v AS (
       |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS lo,
       |    epoch_us(ts) + $AttrWindowUs AS hi
       |  FROM events WHERE event_type = 'view'),
       |p AS (
       |  SELECT user_id, epoch_us(ts) AS tus, value
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT view_id, COUNT(*) AS n_purchases,
       |    ${Det.decSumSql("value")} AS sum_value
       |  FROM v JOIN p ON p.user_id = v.user_id
       |    AND p.tus > v.lo AND p.tus <= v.hi
       |  GROUP BY view_id)
       |SELECT v.view_id, v.user_id,
       |  COALESCE(c.n_purchases, 0) AS n_purchases,
       |  COALESCE(c.sum_value, 0.0) AS sum_value
       |FROM v LEFT JOIN c USING (view_id) ORDER BY v.view_id""".stripMargin

  /** sessionize — batch gap-based sessionization: per user, a ≥ 30 min
    * silence starts a new session; one output row per session with its
    * event count, span, and exact-decimal value sum. The batch twin of
    * `stream_session`, produced by lag + running-sum windows instead of
    * state-store session windows — boundary semantics match Spark's
    * `session_window` exactly (its per-event [ts, ts+gap) windows are
    * half-open, so a gap of EXACTLY 30 min starts a new session;
    * `TemporalSpec` asserts full equivalence against
    * [[graft.streaming.Streams.sessions]]).
    */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_id"), col("value"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val flagged = ev.withColumn("new_s",
      when(lag(col("tus"), 1).over(ord).isNull ||
        col("tus") - lag(col("tus"), 1).over(ord) >= SessionGapUs, 1L)
        .otherwise(0L))
    flagged
      .withColumn("session_idx", sum(col("new_s")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"), max(col("tus")).as("end_us"),
        Det.decSum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  private val sessionizeSql =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value FROM events),
       |fl AS (
       |  SELECT user_id, tus, event_id, value,
       |    CASE WHEN LAG(tus) OVER
       |        (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
       |      OR tus - LAG(tus) OVER
       |        (PARTITION BY user_id ORDER BY tus, event_id)
       |        >= $SessionGapUs
       |      THEN 1 ELSE 0 END AS new_s
       |  FROM ev),
       |sid AS (
       |  SELECT user_id, tus, value,
       |    CAST(SUM(new_s) OVER (PARTITION BY user_id
       |      ORDER BY tus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_idx
       |  FROM fl)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |  MIN(tus) AS start_us, MAX(tus) AS end_us,
       |  MAX(tus) - MIN(tus) AS duration_us,
       |  ${Det.decSumSql("value")} AS sum_value
       |FROM sid GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** X81 — events_attribution: LINEAR multi-touch attribution — every
    * purchase splits its conversion credit equally across the same user's
    * clicks in the preceding hour; purchases with no qualifying touch
    * emit a `click_id = -1` "direct" row with full credit. The marketing
    * sibling of X24's last-touch as-of (last-touch ≡ all credit to the
    * max-ts touch; linear is the other standard model) and the
    * multi-row-grain complement of X25's count-only attribution.
    *
    * Determinism: µs integer window arithmetic (X16 discipline);
    * credit_ppm = 10⁶ div n_touches — floor division, so a 3-touch
    * purchase assigns 3×333333 and the 1 ppm remainder stays
    * deliberately unassigned (documented; assigning it to a designated
    * touch would privilege an arbitrary row).
    *
    * Scale: one user-keyed equi-join (purchases × clicks) + time filter —
    * per-user bounded like X16; the per-purchase touch count is a window
    * over the matched rows, not a second join. A bot user's inflated
    * match block is the X24/X25 skew hazard with the same mitigation
    * (pre-split hot users by day).
    */
  private def eventsAttribution(s: SparkSession, dir: String): DataFrame =
    eventsAttributionOf(events(s, dir))

  /** Testable seam for [[eventsAttribution]]: explicit events frame. */
  private[graft] def eventsAttributionOf(evIn: DataFrame): DataFrame = {
    val ev = evIn.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tus").as("p_tus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("tus").as("c_tus"))
    val matched = p.join(c, Seq("user_id"), "left")
      .withColumn("hit", col("c_tus").isNotNull &&
        col("c_tus") <= col("p_tus") &&
        col("c_tus") > col("p_tus") - 3600000000L)
    val w = Window.partitionBy(col("purchase_id"))
    matched
      .withColumn("n_touches",
        sum(when(col("hit"), 1L).otherwise(0L)).over(w))
      .filter(col("hit") || col("n_touches") === 0)
      .withColumn("rk", row_number().over(
        w.orderBy(col("hit").desc, col("click_id"))))
      .filter(col("hit") || col("rk") === 1)
      .select(col("purchase_id"), col("user_id"),
        when(col("hit"), col("click_id")).otherwise(-1L).as("click_id"),
        col("n_touches"),
        when(col("hit"), expr("1000000 div n_touches"))
          .otherwise(1000000L).as("credit_ppm"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  private val eventsAttributionSql =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_tus
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_tus
      |  FROM events WHERE event_type = 'click'),
      |m AS MATERIALIZED (
      |  SELECT p.purchase_id, p.user_id, c.click_id,
      |    c.click_id IS NOT NULL AND c.c_tus <= p.p_tus
      |      AND c.c_tus > p.p_tus - 3600000000 AS hit
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id),
      |t AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
      |    ROW_NUMBER() OVER (PARTITION BY purchase_id
      |                       ORDER BY hit DESC, click_id) AS rk
      |  FROM m)
      |SELECT purchase_id, user_id,
      |  CASE WHEN hit THEN click_id ELSE -1 END AS click_id,
      |  n_touches,
      |  CASE WHEN hit THEN 1000000 // n_touches ELSE 1000000 END
      |    AS credit_ppm
      |FROM t WHERE hit OR (n_touches = 0 AND rk = 1)
      |ORDER BY purchase_id, click_id""".stripMargin

  /** X82 — events_pit_features: POINT-IN-TIME-correct feature join — for
    * every purchase, the user's trailing-1-hour click count and exact
    * decimal click-value sum computed STRICTLY BEFORE the purchase
    * timestamp. The feature-store correctness problem in one operator: a
    * naive feature join reads state from the future (label leakage); the
    * strict `c_tus < p_tus` gate is the leakage contract, pinned by the
    * oracle (a `<=` regression changes same-µs rows and fails the gate).
    *
    * Shape: the X81 user-keyed join + window filter, aggregated back to
    * the purchase grain (left-join semantics: purchases with no prior
    * click keep (0, 0.0)); value sum via [[Det.dec]] cast before the sum
    * so the aggregate is exact decimal (order-free). At 100 TB this
    * per-entity bounded join + agg IS the training-set materialization
    * pass a feature platform runs per label table.
    */
  private def eventsPitFeatures(s: SparkSession, dir: String): DataFrame =
    eventsPitFeaturesOf(events(s, dir))

  /** Testable seam for [[eventsPitFeatures]]: explicit events frame. */
  private[graft] def eventsPitFeaturesOf(evIn: DataFrame): DataFrame = {
    val ev = evIn.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"), col("value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tus").as("p_tus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus").as("c_tus"),
        Det.dec(col("value")).as("v"))
    p.join(c, Seq("user_id"), "left")
      .withColumn("hit", col("c_tus").isNotNull &&
        col("c_tus") < col("p_tus") &&
        col("c_tus") >= col("p_tus") - 3600000000L)
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_clicks_1h"),
        coalesce(sum(when(col("hit"), col("v"))), lit(0))
          .cast("double").as("click_value_1h"))
      .orderBy(col("purchase_id"))
  }

  private val eventsPitFeaturesSql =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_tus
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, epoch_us(ts) AS c_tus,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE event_type = 'click'),
      |m AS (
      |  SELECT p.purchase_id, p.user_id,
      |    c.c_tus IS NOT NULL AND c.c_tus < p.p_tus
      |      AND c.c_tus >= p.p_tus - 3600000000 AS hit,
      |    c.v
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id)
      |SELECT purchase_id, user_id,
      |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks_1h,
      |  CAST(COALESCE(SUM(CASE WHEN hit THEN v END), 0) AS DOUBLE)
      |    AS click_value_1h
      |FROM m GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin

  /** µs of coverage per cent of event value — calibrated in DuckDB
    * before landing (10 s/cent): 277/2 867/285 920 merged intervals
    * with real multi-event groups (max 19/39/42) AND singletons at
    * sf0.001/0.01/sf1 — neither everything-merges nor nothing-merges.
    */
  private val IvPerCentUs = 10000000L

  /** X136 — events_interval_union: INTERVAL COALESCING — merge each
    * user's overlapping-or-touching half-open activity leases
    * `[t, t + cents·[[IvPerCentUs]])` into maximal disjoint intervals
    * (the uptime/coverage/booking-consolidation operator; VARIABLE
    * interval lengths are what `sessionize`'s fixed-gap logic cannot
    * express — an interval can swallow several later ones, so "gap to
    * previous event" is the wrong predicate). The classic two-window
    * form: a row opens a new group iff its start exceeds the RUNNING
    * MAX of all preceding ends (ROWS … 1 PRECEDING), group id = running
    * sum of those break flags — both windows share the one (user) key
    * and the total (s, e, event_id) order; ties are harmless (max is
    * order-free) but the total order is pinned anyway (t9 lesson).
    * Exact µs integers end to end — zero FP.
    *
    * Scale: ONE exchange on user_id serves both windows and the final
    * group-by; state per user is bounded by its event count. Output one
    * row per merged interval: (user_id, start_us, end_us, n_events).
    */
  private def eventsIntervalUnion(s: SparkSession, dir: String):
      DataFrame = intervalUnionOf(events(s, dir))

  /** Testable seam for [[eventsIntervalUnion]]: explicit events frame. */
  private[graft] def intervalUnionOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("e"), col("event_id"))
    val iv = ev.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        expr("cast(floor(value * 100 + 0.5) as bigint)") * IvPerCentUs)
        .as("e"))
    iv
      .withColumn("pmax", max(col("e"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us"))
  }

  private val eventsIntervalUnionSql =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS s,
       |    CAST(epoch_us(ts) AS BIGINT) +
       |      CAST(floor(value * 100 + 0.5) AS BIGINT) * $IvPerCentUs AS e
       |  FROM events),
       |o AS (
       |  SELECT *, CAST(MAX(e) OVER (PARTITION BY user_id
       |    ORDER BY s, e, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
       |    AS pmax
       |  FROM iv),
       |g AS (
       |  SELECT *, CASE WHEN pmax IS NULL OR s > pmax
       |    THEN 1 ELSE 0 END AS brk FROM o),
       |gg AS (
       |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
       |    ORDER BY s, e, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS grp FROM g)
       |SELECT user_id, MIN(s) AS start_us, MAX(e) AS end_us,
       |  COUNT(*) AS n_events
       |FROM gg GROUP BY user_id, grp
       |ORDER BY user_id, start_us""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("events_interval_union", eventsIntervalUnion,
      Some(eventsIntervalUnionSql)),
    Q("asof_join", asofJoin, Some(asofJoinSql)),
    Q("asof_join_nearest", asofJoinNearest, Some(asofJoinNearestSql)),
    Q("range_join", rangeJoin, Some(rangeJoinSql)),
    Q("sessionize", sessionize, Some(sessionizeSql)),
    Q("events_attribution", eventsAttribution, Some(eventsAttributionSql)),
    Q("events_pit_features", eventsPitFeatures, Some(eventsPitFeaturesSql)),
  )
}
