package graft

import graft.functions.{GraftFunctions, MinHashAgg}
import org.apache.spark.sql.functions._

/** The typed MinHash Aggregator must agree with the Column-algebra
  * formulation used by the production X2 query, and both custom functions
  * must be reachable from SQL after registration.
  */
class MinHashAggSpec extends GraftSuite {
  import spark.implicits._

  private val (a1, b1, a2, b2, p) =
    (1103515245L, 12345L, 214013L, 2531011L, 2147483647L)

  test("Aggregator matches the array_min Column formulation") {
    val hs = Seq((1L, Seq(17L, 99L, 3L)), (2L, Seq(1000L, 5L)))
      .toDF("doc_id", "hs")
    val viaColumns = hs.select(col("doc_id"),
      array_min(transform(col("hs"),
        h => (h * a1 % p + b1) % p)).as("mh1"),
      array_min(transform(col("hs"),
        h => (h * a2 % p + b2) % p)).as("mh2"))
    val viaAgg = hs.select(col("doc_id"), explode(col("hs")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg(a1, b1, a2, b2, p).toColumn.name("sig"))
      .select(col("key").as("doc_id"),
        col("sig._1").as("mh1"), col("sig._2").as("mh2"))
    assert(rows(viaAgg.orderBy("doc_id")) === rows(viaColumns.orderBy("doc_id")))
  }

  test("custom functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("g", "h")
      .createOrReplaceTempView("hashes")
    val sig = spark.sql(
      "SELECT g, minhash_band(h) AS sig FROM hashes GROUP BY g ORDER BY g")
    assert(sig.count() === 2)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT array_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(d === 11.0)
  }
}
