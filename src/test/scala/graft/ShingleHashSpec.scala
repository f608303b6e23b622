package graft

import graft.functions.{ShingleHash, TextFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge

/** The native [[graft.functions.ShingleHash]] codegen expression must be
  * bit-identical to the Column-function formulation (3-gram shingles
  * hashed with [[TextFns.stringHash]]) it accelerates.
  */
class ShingleHashSpec extends GraftSuite {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column) =
    SqlBridge.column(ShingleHash(SqlBridge.expression(c)))

  /** The slow declarative twin: split, 3-gram windows, rolling hash —
    * built on the interpreted reference fold, NOT the codegen kernel, so
    * this stays an independent implementation.
    */
  private def hofShingles(c: org.apache.spark.sql.Column) =
    transform(TextFns.shingles(split(c, " ", -1), 3),
      sh => TextFns.stringHashRef(sh))

  test("matches the HOF shingle+hash formulation on real-ish text") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",
      "repeated repeated repeated repeated",
      "x  y z", // double space: empty token, like split(' ',-1) keeps
      "trailing space ends here ")
      .toDF("text")
    val got = docs.select(native(col("text")).as("n"),
      hofShingles(col("text")).as("h")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("fewer than 3 tokens hashes to an empty array") {
    val docs = Seq("", "one", "two words").toDF("text")
    val got = docs.select(native(col("text")).as("n")).collect()
    got.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("StringHash matches the interpreted reference fold") {
    val docs = Seq(
      "", " ", "a", "the quick brown fox", "x  y z",
      "trailing space ends here ", "unicode-free ascii only 123")
      .toDF("text")
    val got = docs.select(
      TextFns.stringHash(col("text")).as("k"),
      TextFns.stringHashRef(col("text")).as("r")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
  }

  test("StringHash participates in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.execution.debug.codegenString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val gen = try {
      val df = spark.range(4)
        .select(concat(lit("doc "), col("id").cast("string")).as("text"))
        .select(TextFns.stringHash(col("text")).as("h"))
        .filter(col("h") >= 0)
      codegenString(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(gen.contains("WholeStageCodegen"))
    assert(gen.contains("TextKernels.stringHash"), gen.take(500))
  }

  test("ShingleHash participates in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.execution.debug.codegenString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val gen = try {
      val df = spark.range(4)
        .select(concat(lit("tok "), col("id").cast("string"),
          lit(" tail mid end")).as("text"))
        .select(native(col("text")).as("hs"))
        .filter(size(col("hs")) > 0)
      codegenString(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(gen.contains("WholeStageCodegen"))
    assert(gen.contains("shingleHashes"), gen.take(500))
  }

  test("null text yields null") {
    val docs = Seq(Option.empty[String], Some("a b c d")).toDF("text")
    val r = docs.select(native(col("text")).as("hs")).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getSeq[Long](0).length)
    assert(r.toSet === Set(-1, 2))
  }
}
