package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: the Spark implementation plus (when
  * SQL-expressible) its DuckDB twin. Column names and row order must match
  * between the two — the driver sorts columns by name and hash-compares
  * values (SURVEY §7.4), so every query ends with a total ORDER BY over a
  * unique key, on both sides.
  */
case class Q(key: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String])

object Registry {
  lazy val all: Seq[Q] =
    Substrate.qs ++ ScalarFns.qs ++ GraphQueries.qs ++ IterQueries.qs ++
      UserGraphQueries.qs ++ NetworkQueries.qs ++ TextQueries.qs ++
      DedupQueries.qs ++ SimQueries.qs ++ StreamQueries.qs ++
      PipelineQueries.qs ++ TemporalQueries.qs ++ FeatureQueries.qs

  lazy val byKey: Map[String, Q] = all.map(q => q.key -> q).toMap
}
