package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[graft.queries.Registry]]; this object only adapts
  * them to the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Builds the canonical G_trade graph (S1) and returns its edge set.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.sources.GTrade(spark, "/root/testdata/sf0.001").edges

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.key -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (label_propagation tie-breaking, IVF centroid float sums).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
