package graft

import graft.queries.{PipelineQueries, StreamQueries}
import org.apache.spark.sql.functions._

/** Unit coverage for the round-9 sketch-ladder additions (X68/X69) and the
  * deterministic stratified reservoir (X70) — adversarial inputs the
  * near-uniform fixture tables cannot produce: forced skew for the CMS
  * contracts, a hand-computed overlap lattice (including a disjoint pair,
  * the `na.fill` path), and the two-phase bottom-k vs its one-window
  * semantic spec under hostile partitioning.
  */
class SketchLadderSpec extends GraftSuite {

  test("events_heavy_hitters: forced skew — hot keys lead, contracts hold") {
    import spark.implicits._
    // One user with 500 events, one with 100, 50 singletons: a real
    // heavy-hitter profile (the sf fixtures are near-uniform).
    val ev = (Seq.fill(500)(7L) ++ Seq.fill(100)(3L) ++
      (100L until 150L)).toDF("user_id").repartition(5)
    val out = StreamQueries.eventsHeavyHittersOf(spark, ev).collect()
    assert(out.length === 20)
    assert(out(0).getLong(0) === 7L && out(0).getLong(1) === 500L)
    assert(out(1).getLong(0) === 3L && out(1).getLong(1) === 100L)
    // Singleton ties broken by user_id ascending.
    assert(out.drop(2).map(_.getLong(0)).toSeq ===
      (100L until 118L).toSeq)
    // Counts non-increasing; both sketch contracts true on every row;
    // integer ppm share consistent with exact counts (total = 650).
    assert(out.sliding(2).forall(p => p(0).getLong(1) >= p(1).getLong(1)))
    out.foreach { r =>
      assert(r.getBoolean(3), s"underestimate on $r")
      assert(r.getBoolean(4), s"eps band on $r")
      assert(r.getLong(2) === r.getLong(1) * 1000000L / 650L)
    }
  }

  test("events_heavy_hitters: deterministic across partitioning") {
    import spark.implicits._
    val base = (0L until 300L).map(i => i % 37)
    val a = StreamQueries
      .eventsHeavyHittersOf(spark, base.toDF("user_id").repartition(1))
      .collect().map(_.toSeq).toSeq
    val b = StreamQueries
      .eventsHeavyHittersOf(spark, base.toDF("user_id").repartition(11))
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("events_type_overlap: hand-computed lattice incl. disjoint pair") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,3,4}, C = {9} (duplicates must not count twice).
    val ev = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 4L),
      ("C", 9L)).toDF("event_type", "user_id").repartition(3)
    val out = StreamQueries.eventsTypeOverlapOf(spark, ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(out.toSeq === Seq(
      ("A", "B", 3L, 3L, 2L, 4L, 500000L, true),
      ("A", "C", 3L, 1L, 0L, 4L, 0L, true),
      ("B", "C", 3L, 1L, 0L, 4L, 0L, true)))
  }

  test("sample_reservoir: equals the one-window spec; partition-invariant") {
    import spark.implicits._
    // 400 docs across 3 langs with repeated-ish texts kept unique by id
    // so the (h, doc_id) order is total.
    val docs = (0L until 400L)
      .map(i => (i, Seq("en", "de", "zh")(i.toInt % 3), s"doc $i ${"x" * (i.toInt % 11)}"))
      .toDF("doc_id", "lang", "text")
    val twoPhase = PipelineQueries.sampleReservoirOf(docs.repartition(13))
      .collect().map(_.toSeq).toSeq
    val again = PipelineQueries.sampleReservoirOf(docs.repartition(2))
      .collect().map(_.toSeq).toSeq
    assert(twoPhase === again)
    // Independent one-window spec: rank by (h, doc_id) within lang.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val spec = docs
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFns
          .stringHash(concat(lit("reservoir:"), col("text"))).as("h"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= 5)
      .select(col("lang"), col("sample_rank"), col("doc_id"), col("h"))
      .orderBy(col("lang"), col("sample_rank"))
      .collect().map(_.toSeq).toSeq
    assert(twoPhase === spec)
    // Fixed size per stratum, by construction.
    assert(twoPhase.groupBy(_.head).forall(_._2.size == 5))
  }
}
