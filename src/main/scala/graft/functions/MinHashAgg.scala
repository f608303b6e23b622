package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a two-row MinHash band signature over a
  * group of shingle hashes: (min (a1·h+b1) mod p, min (a2·h+b2) mod p).
  *
  * This is the Spark mapping of the reference's `GroupReduceFunction` UDF
  * surface (SURVEY §2.11): a user-defined associative reduction with a
  * typed buffer, registered through `spark.udf.register` (see
  * [[GraftFunctions.register]]) so it is callable from both the Dataset
  * API and SQL. The production MinHash query (X2) uses pure Column algebra
  * over the signature arrays — this Aggregator is the same computation
  * expressed as a UDAF, kept verifiably in parity by
  * `MinHashAggSpec`.
  *
  * Scale notes: the buffer is two Longs; merge is pointwise min — fully
  * map-side combinable, so the shuffle carries one tiny buffer per
  * (group × partition), not the shingle sets.
  */
case class MinHashAgg(a1: Long, b1: Long, a2: Long, b2: Long, p: Long)
  extends Aggregator[Long, (Long, Long), (Long, Long)] {

  override def zero: (Long, Long) = (Long.MaxValue, Long.MaxValue)

  override def reduce(buf: (Long, Long), h: Long): (Long, Long) = (
    math.min(buf._1, (h * a1 % p + b1) % p),
    math.min(buf._2, (h * a2 % p + b2) % p))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (math.min(x._1, y._1), math.min(x._2, y._2))

  override def finish(buf: (Long, Long)): (Long, Long) = buf

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
