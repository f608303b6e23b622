package graft

import graft.sources.IdEncoder
import org.apache.spark.sql.functions._

/** Generic-key dictionary encoding (SURVEY §1.3): the reference's
  * `Graph<K,VV,EV>` admits any comparable key type; we map keys to dense
  * Long ids deterministically (rank in sorted distinct key set).
  */
class IdEncoderSpec extends GraftSuite {
  import spark.implicits._

  private def stringGraph = (
    Seq(("beta", 1L), ("alpha", 2L), ("gamma", 3L)).toDF("key", "value"),
    Seq(("alpha", "beta", 10L), ("beta", "gamma", 20L),
      ("gamma", "alpha", 30L)).toDF("src_key", "dst_key", "value"))

  test("ids are ranks in sorted key order, independent of input order") {
    val (v, e) = stringGraph
    val (dict, _) = IdEncoder.encode(spark, v, e)
    assert(pairs(dict.select(col("id"), col("id"))).map(_._1) === Seq(0L, 1L, 2L))
    val m = dict.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m === Map("alpha" -> 0L, "beta" -> 1L, "gamma" -> 2L))
    // Same keys, different row order ⇒ identical dictionary.
    val (dict2, _) = IdEncoder.encode(spark,
      v.orderBy(col("value").desc), e.orderBy(col("value").desc))
    assert(dict2.collect().map(r => (r.getString(0), r.getLong(1))).toMap === m)
  }

  test("encoded graph supports Long-id operators; decode restores keys") {
    val (v, e) = stringGraph
    val (dict, g) = IdEncoder.encode(spark, v, e)
    assert(g.invalidEndpoints.count() === 0)
    val deg = IdEncoder.decode(g.degrees, dict, "id", "key")
    val byKey = deg.collect().map(r => (r.getAs[String]("key"),
      r.getAs[Long]("degree"))).toMap
    assert(byKey === Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 2L))
  }

  test("edge endpoints absent from the vertex list still get dictionary ids") {
    val v = Seq(("only", 1L)).toDF("key", "value")
    val e = Seq(("only", "dangling", 1L)).toDF("src_key", "dst_key", "value")
    val (dict, g) = IdEncoder.encode(spark, v, e)
    assert(dict.count() === 2)
    // "dangling" has an id but no vertex row — flagged by validation.
    assert(g.invalidEndpoints.count() === 1)
  }
}
