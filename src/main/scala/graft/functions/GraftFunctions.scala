package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration for the engine's custom functions, so SQL
  * users get the same catalog the Column API uses (reference parity: the
  * reference exposes its UDF surface only through Java interfaces; ours is
  * additionally callable from `spark.sql(...)`).
  */
object GraftFunctions {
  /** Band parameters of the first MinHash band (DedupQueries.BandParams). */
  private val DefaultBand = MinHashAgg(
    1103515245L, 12345L, 214013L, 2531011L, 2147483647L)

  def register(spark: SparkSession): Unit = {
    // Codegen'd scalar: dot product over float/double arrays.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs.head, exprs(1)), "scala_udf")
    // Codegen'd scalar: word-3-gram rolling-hash shingles.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash", exprs => ShingleHash(exprs.head), "scala_udf")
    // Typed Aggregator as a SQL UDAF.
    spark.udf.register("minhash_band", udaf(DefaultBand))
  }
}
