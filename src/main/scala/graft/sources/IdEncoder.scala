package graft.sources

import graft.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary encoding for non-Long vertex keys.
  *
  * The reference's `Graph<K, VV, EV>` is generic in the key type ([GH]
  * flink/graphs/Graph.java#class — provenance caveat in SURVEY §0); our
  * relational layer and GraphX both want dense Long ids. This encoder maps
  * an arbitrary orderable key column to a deterministic dense Long id:
  * id = rank of the key in the SORTED distinct key set (0-based).
  *
  * Determinism (SURVEY §7.3.3): the mapping is a pure function of the key
  * SET — independent of partitioning, task scheduling, and input order —
  * unlike `monotonically_increasing_id`. It therefore hash-compares
  * exactly against a DuckDB `dense_rank() OVER (ORDER BY key) - 1` twin.
  *
  * Scale notes: implemented as distributed sort + `zipWithIndex` (one
  * extra pass to count per-partition offsets) — no global window collapse
  * to a single partition, no driver materialization. The dictionary is
  * |distinct keys| rows; joins against it are plain equi-joins that AQE
  * broadcasts when small.
  */
object IdEncoder {

  /** Distinct keys of `df("key")` → (key, id LONG) dictionary. */
  def dictionary(s: SparkSession, keys: DataFrame): DataFrame = {
    import s.implicits._
    val k = keys.select(col("key").cast("string")).distinct()
      .orderBy(col("key"))
      .as[String].rdd
      .zipWithIndex()
      .map { case (key, id) => (key, id) }
    k.toDF("key", "id")
  }

  /** Encode a string-keyed graph: vertices (key, value), edges
    * (src_key, dst_key, value) → (dictionary, Long-id [[graft.Graph]]).
    */
  def encode(s: SparkSession, vertices: DataFrame,
             edges: DataFrame): (DataFrame, Graph) = {
    val allKeys = vertices.select(col("key"))
      .union(edges.select(col("src_key").as("key")))
      .union(edges.select(col("dst_key").as("key")))
    val dict = dictionary(s, allKeys)
    val v = vertices.join(dict, Seq("key"))
      .select(col("id"), col("value"))
    val e = edges
      .join(dict.withColumnRenamed("key", "src_key")
        .withColumnRenamed("id", "src"), Seq("src_key"))
      .join(dict.withColumnRenamed("key", "dst_key")
        .withColumnRenamed("id", "dst"), Seq("dst_key"))
      .select(col("src"), col("dst"), col("value"))
    (dict, Graph(v, e))
  }

  /** Decode: join Long ids in `col(idCol)` back to their natural keys. */
  def decode(df: DataFrame, dict: DataFrame, idCol: String,
             keyCol: String): DataFrame =
    df.join(dict.withColumnRenamed("id", idCol)
        .withColumnRenamed("key", keyCol), Seq(idCol))
}
